from era_parser_spark.queries.registry import ORACLES, QUERIES, load_all

__all__ = ["QUERIES", "ORACLES", "load_all"]
