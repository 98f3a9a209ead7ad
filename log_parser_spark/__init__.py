"""PySpark-native parse -> enrich -> route -> aggregate engine with the
query surface of speedb-io/log-parser (reference studied at
/root/reference; no code reused at runtime — it serves only as a test
oracle)."""

__version__ = "0.1.0"
