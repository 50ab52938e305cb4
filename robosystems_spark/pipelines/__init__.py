"""ETL pipelines: raw source data → per-table graph frames.

Re-expresses the reference's pandas processors (XBRL filings via
XBRLGraphProcessor, QuickBooks/Plaid transactions) as distributed
Spark transformations producing the roboledger-schema node and
relationship frames.
"""

from robosystems_spark.pipelines.xbrl import (  # noqa: F401
    build_xbrl_graph_frames,
    build_xbrl_taxonomy_frames,
    classify_elements,
)
from robosystems_spark.pipelines.assets import (  # noqa: F401
    AssetContext,
    AssetGraph,
    MaterializeResult,
)
from robosystems_spark.pipelines.xbrl_parse import (  # noqa: F401
    parse_instance,
    raw_facts_from_filings,
)
from robosystems_spark.pipelines.gl import build_gl_frames  # noqa: F401
from robosystems_spark.pipelines.connectors import (  # noqa: F401
    normalize_plaid_transactions,
    normalize_quickbooks_journal,
    plaid_account_elements,
)
