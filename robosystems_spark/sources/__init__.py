"""Sources & sinks: file staging, graph-table materialization, export."""
