"""Custom data sources (Python DataSource API, Spark 4)."""
