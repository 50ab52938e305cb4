"""General-ledger transactions → graph frames.

Re-expresses the QuickBooks/Plaid transaction processors
(/root/reference/robosystems/adapters/{quickbooks,plaid}/processors/
transactions.py) as Spark transformations: journal rows with entry
arrays become Transaction/LineItem/Element node frames plus the GL
relationship chain consumed by the trial-balance view.

Expected input: one row per transaction with
  txn_number STRING, date DATE/STRING, description STRING,
  currency STRING, entity_id STRING,
  entries ARRAY<STRUCT<account STRING, account_class STRING,
                        debit DOUBLE, credit DOUBLE>>

Double-entry integrity (sum(debits) == sum(credits) per transaction)
is validated and violations surfaced, mirroring the processors'
balancing checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from robosystems_spark.functions.ids import content_hash_id


def build_gl_frames(transactions: DataFrame, validate: bool = True) -> dict[str, DataFrame]:
    tx = transactions.withColumn(
        "_txn_id", content_hash_id("entity_id", "txn_number", prefix="txn_")
    )
    if validate:
        bal = tx.select(
            "_txn_id",
            F.expr(
                "aggregate(entries, CAST(0.0 AS DOUBLE), (a, e) -> a + e.debit - e.credit)"
            ).alias("imbalance"),
        ).filter(F.abs(F.col("imbalance")) > 1e-9)
        bad = [r["_txn_id"] for r in bal.limit(5).collect()]
        if bad:
            raise ValueError(f"Unbalanced transactions (debits != credits): {bad}")

    lines = tx.select(
        "_txn_id", "entity_id",
        F.posexplode("entries").alias("_line_no", "e"),
    ).withColumns(
        {
            "_line_id": content_hash_id(
                "_txn_id", F.col("_line_no").cast("string"), prefix="li_"
            ),
            "_element_id": content_hash_id(F.col("e.account"), prefix="acct_"),
        }
    )
    lines = lines.cache()

    # connector provenance columns (Plaid/QuickBooks normalizers) ride
    # through onto the Transaction node when present (schema
    # roboledger.py Transaction: plaid_*, sync_hash)
    passthrough = [
        c
        for c in (
            "plaid_category", "plaid_merchant_name", "plaid_pending",
            "qb_transaction_id", "sync_hash", "transaction_type",
            "reference_number", "status",
        )
        if c in tx.columns
    ]
    transaction = tx.select(
        F.col("_txn_id").alias("identifier"),
        F.col("txn_number").alias("transaction_number"),
        F.expr(
            "aggregate(entries, CAST(0.0 AS DOUBLE), (a, e) -> a + e.debit)"
        ).alias("amount"),
        F.col("description"),
        F.col("date").cast("date").alias("date"),
        F.col("currency"),
        *[F.col(c) for c in passthrough],
    ).dropDuplicates(["identifier"])

    line_item = lines.select(
        F.col("_line_id").alias("identifier"),
        F.col("e.account").alias("description"),
        F.col("e.debit").alias("debit_amount"),
        F.col("e.credit").alias("credit_amount"),
    ).dropDuplicates(["identifier"])

    element = lines.select(
        F.col("_element_id").alias("identifier"),
        F.concat(F.lit("acct:"), F.col("e.account")).alias("uri"),
        F.col("e.account").alias("qname"),
        F.col("e.account").alias("name"),
        F.col("e.account_class").alias("classification"),
        F.when(
            F.col("e.account_class").isin("asset", "expense"), "debit"
        ).otherwise("credit").alias("balance"),
        F.when(F.col("e.account_class").isin("asset", "liability", "equity"), "instant")
        .otherwise("duration").alias("period_type"),
    ).dropDuplicates(["identifier"])

    return {
        "Transaction": transaction,
        "LineItem": line_item,
        "Element": element,
        "ENTITY_HAS_TRANSACTION": tx.select(
            F.col("entity_id").alias("src"), F.col("_txn_id").alias("dst")
        ).dropDuplicates(),
        "TRANSACTION_HAS_LINE_ITEM": lines.select(
            F.col("_txn_id").alias("src"), F.col("_line_id").alias("dst")
        ).dropDuplicates(),
        "LINE_ITEM_RELATES_TO_ELEMENT": lines.select(
            F.col("_line_id").alias("src"), F.col("_element_id").alias("dst")
        ).dropDuplicates(),
    }


GL_NODE_TABLES = ["Transaction", "LineItem", "Element"]
GL_REL_TABLES = [
    "ENTITY_HAS_TRANSACTION", "TRANSACTION_HAS_LINE_ITEM", "LINE_ITEM_RELATES_TO_ELEMENT"
]
