"""QuickBooks / Plaid transaction normalizers → the GL journal shape.

Re-expresses the reference's connector processors as distributed
transformations producing the journal rows ``build_gl_frames``
consumes (and, for Plaid, the bank-account Element frame):

- Plaid (/root/reference/robosystems/adapters/plaid/processors/
  transactions.py:102-250): bank accounts become Element nodes with
  plaid metadata, balance-sheet classification by account type
  (depository/investment → debit-balance asset, credit/loan →
  credit-balance liability, :128-136), URI/QName per uri_utils; the
  added/modified/removed sync protocol becomes set algebra
  (keep-last upsert + anti-join delete); single-leg Plaid amounts are
  expanded to double-entry journal rows (Plaid sign convention:
  positive amount = money leaving the account).
- QuickBooks (/root/reference/robosystems/adapters/quickbooks/
  processors/transactions.py:24-35 + client/api.py:170-186): journal
  entries with Debit/Credit posting lines map to the same journal
  shape; account classification derives from the QB account type.

The reference upserts row-at-a-time through Cypher MERGE; here each
sync batch is one DataFrame pass and the store-level upsert is
GraphStore.copy_into/merge (the scalable bulk path the reference
itself prefers — materialize.py docstring: row-wise MERGE measured
40x slower).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from robosystems_spark.functions.ids import content_hash_id

# Plaid account type → (account class, normal balance) per
# transactions.py:128-136
_PLAID_ASSET_TYPES = ("depository", "investment")
_PLAID_LIABILITY_TYPES = ("credit", "loan")


def plaid_account_elements(accounts: DataFrame) -> DataFrame:
    """Bank accounts → Element node frame (transactions.py:102-181).

    Expected columns: account_id, name, type, subtype (nullable),
    mask (nullable), current_balance, available_balance, currency.
    """
    typ = F.lower(F.col("type"))
    clean_name = F.regexp_replace(F.col("name"), r"[^\w]", "")
    qname_tail = F.when(
        F.col("subtype").isNotNull() & (F.col("subtype") != ""),
        F.concat_ws("_", clean_name, F.col("type"), F.col("subtype")),
    ).otherwise(F.concat_ws("_", clean_name, F.col("type")))
    uri = F.concat(
        F.lit("https://plaid.com/account/"), F.col("account_id"), F.lit("#element")
    )
    return accounts.select(
        content_hash_id(uri, prefix="elem_").alias("identifier"),
        uri.alias("uri"),
        F.concat(F.lit("plaid:"), F.regexp_replace(qname_tail, " ", "")).alias("qname"),
        F.col("name"),
        F.lit("bank_account").alias("classification"),
        F.lit("instant").alias("period_type"),
        F.lit("Monetary").alias("type"),
        F.when(typ.isin(*_PLAID_LIABILITY_TYPES), "credit")
        .otherwise("debit")
        .alias("balance"),
        F.lit(False).alias("is_abstract"),
        F.lit(True).alias("is_numeric"),
        F.lit("http://www.xbrl.org/2003/instance#item").alias("substitution_group"),
        F.lit("http://www.xbrl.org/2003/instance#monetaryItemType").alias("item_type"),
        F.col("account_id").alias("plaid_account_id"),
        F.col("type").alias("plaid_account_type"),
        F.col("subtype").alias("plaid_subtype"),
        F.col("mask").alias("plaid_mask"),
        F.col("current_balance").cast("double"),
        F.col("available_balance").cast("double"),
        F.col("currency"),
    ).dropDuplicates(["identifier"])


def normalize_plaid_transactions(
    added: DataFrame,
    modified: DataFrame | None = None,
    removed_ids: DataFrame | None = None,
    entity_id: str = "entity",
    accounts: DataFrame | None = None,
) -> DataFrame:
    """Plaid sync batches → double-entry journal rows.

    Sync semantics (transactions.py:52-100): ``modified`` upserts over
    ``added`` (keep-last by transaction_id), ``removed_ids``
    (column ``transaction_id``) anti-joins out — one distributed pass
    instead of per-row MERGE/DELETE round-trips.

    Expected transaction columns: transaction_id, account_id, amount,
    date, name, merchant_name (nullable), pending (nullable),
    category (nullable), currency (nullable).

    Double-entry expansion (the reference stores the raw single-leg
    amount; the GL chain needs legs): Plaid's sign convention is
    positive = outflow.  Outflows debit the category (expense) and
    credit the bank account; inflows debit the bank and credit the
    category (revenue).  The bank leg's account/class come from
    ``accounts`` when given (account name + type), else the account_id
    with class 'asset'.
    """
    txns = added.withColumn("_prec", F.lit(0))
    if modified is not None:
        txns = txns.unionByName(
            modified.withColumn("_prec", F.lit(1)), allowMissingColumns=True
        )
    # keep-last: highest precedence row per transaction_id wins
    txns = (
        txns.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("transaction_id").orderBy(F.desc("_prec"))
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_prec")
    )
    if removed_ids is not None:
        txns = txns.join(
            removed_ids.select("transaction_id"), "transaction_id", "left_anti"
        )

    for c in ("category", "currency", "merchant_name"):
        if c not in txns.columns:
            txns = txns.withColumn(c, F.lit(None).cast("string"))
    if accounts is not None:
        acct = accounts.select(
            "account_id",
            F.col("name").alias("_acct_name"),
            F.when(
                F.lower("type").isin(*_PLAID_LIABILITY_TYPES), "liability"
            ).otherwise("asset").alias("_acct_class"),
        )
        txns = txns.join(F.broadcast(acct), "account_id", "left")
    else:
        txns = txns.withColumn("_acct_name", F.col("account_id")).withColumn(
            "_acct_class", F.lit("asset")
        )
    txns = txns.withColumn(
        "_acct_name", F.coalesce("_acct_name", F.col("account_id"))
    ).withColumn("_acct_class", F.coalesce("_acct_class", F.lit("asset")))

    amt = F.col("amount").cast("double")
    mag = F.abs(amt)
    category = F.coalesce(
        F.col("category"), F.col("merchant_name"), F.lit("Uncategorized")
    )
    bank_leg = F.struct(
        F.col("_acct_name").alias("account"),
        F.col("_acct_class").alias("account_class"),
        F.when(amt < 0, mag).otherwise(F.lit(0.0)).alias("debit"),
        F.when(amt >= 0, mag).otherwise(F.lit(0.0)).alias("credit"),
    )
    category_leg = F.struct(
        category.alias("account"),
        F.when(amt >= 0, F.lit("expense")).otherwise(F.lit("revenue")).alias(
            "account_class"
        ),
        F.when(amt >= 0, mag).otherwise(F.lit(0.0)).alias("debit"),
        F.when(amt < 0, mag).otherwise(F.lit(0.0)).alias("credit"),
    )
    return txns.select(
        F.col("transaction_id").alias("txn_number"),
        F.col("date").cast("string").alias("date"),
        F.coalesce("name", F.lit("")).alias("description"),
        F.coalesce("currency", F.lit("USD")).alias("currency"),
        F.lit(entity_id).alias("entity_id"),
        F.array(bank_leg, category_leg).alias("entries"),
        # connector provenance the Transaction schema carries
        F.col("merchant_name").alias("plaid_merchant_name"),
        F.coalesce(F.col("pending").cast("boolean"), F.lit(False)).alias(
            "plaid_pending"
        ),
        F.col("category").alias("plaid_category"),
    )


# QuickBooks account type → account class (chart-of-accounts mapping
# the QB COA sync uses; client/api.py account objects)
_QB_CLASS = {
    "bank": "asset",
    "accounts receivable": "asset",
    "other current asset": "asset",
    "fixed asset": "asset",
    "other asset": "asset",
    "accounts payable": "liability",
    "credit card": "liability",
    "other current liability": "liability",
    "long term liability": "liability",
    "equity": "equity",
    "income": "revenue",
    "other income": "revenue",
    "expense": "expense",
    "other expense": "expense",
    "cost of goods sold": "expense",
}


def qb_account_class(account_type_col):
    """QB AccountType → trial-balance class as a CASE chain."""
    col = F.lower(account_type_col)
    expr = F.lit("expense")
    for qb_type, cls in reversed(list(_QB_CLASS.items())):
        expr = F.when(col == qb_type, F.lit(cls)).otherwise(expr)
    return expr


def normalize_quickbooks_journal(entries: DataFrame, entity_id: str = "entity") -> DataFrame:
    """QuickBooks journal entries → journal rows.

    Expected shape (JournalEntry.to_dict() flattened; client/api.py:
    170-186): one row per entry with
      qb_id, txn_date, doc_number (nullable), currency (nullable),
      lines ARRAY<STRUCT<amount DOUBLE, posting_type STRING
      ('Debit'|'Credit'), account STRING, account_type STRING,
      description STRING>>

    Posting lines map onto debit/credit legs; account class derives
    from the QB account type (chart-of-accounts semantics the
    processor's COA sync establishes).
    """
    line = F.expr(
        "transform(lines, l -> struct("
        "  l.account as account,"
        "  l.account_type as account_type,"
        "  case when lower(l.posting_type) = 'debit' then l.amount else cast(0.0 as double) end as debit,"
        "  case when lower(l.posting_type) = 'credit' then l.amount else cast(0.0 as double) end as credit))"
    )
    exploded = entries.withColumn("_legs", line)
    # re-pack with the class mapping applied per leg (SQL CASE mirrors
    # qb_account_class so the whole transform stays one expression)
    cases = " ".join(
        f"when lower(l.account_type) = '{t}' then '{c}'" for t, c in _QB_CLASS.items()
    )
    classed = F.expr(
        "transform(_legs, l -> struct("
        "  l.account as account,"
        f"  case {cases} else 'expense' end as account_class,"
        "  l.debit as debit,"
        "  l.credit as credit))"
    )
    desc = (
        F.coalesce("description", F.lit(""))
        if "description" in entries.columns
        else F.lit("")
    )
    return exploded.select(
        F.coalesce("doc_number", F.col("qb_id")).alias("txn_number"),
        F.col("txn_date").cast("string").alias("date"),
        desc.alias("description"),
        F.coalesce("currency", F.lit("USD")).alias("currency"),
        F.lit(entity_id).alias("entity_id"),
        classed.alias("entries"),
        F.col("qb_id").alias("qb_transaction_id"),
    )
