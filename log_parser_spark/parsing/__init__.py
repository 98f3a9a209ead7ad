from log_parser_spark.parsing.document import parse_document  # noqa: F401
