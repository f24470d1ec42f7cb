from sifts_spark.plans.catalog import QUERIES, ORACLES, flagship

__all__ = ["QUERIES", "ORACLES", "flagship"]
