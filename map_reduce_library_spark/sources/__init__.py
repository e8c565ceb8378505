"""Sources & sinks: directory scanning (reference C1 parity) and
text/CSV/JSON/Parquet connectors."""
