from diseasystore_spark.stores.tpch import TpchDiseasystore

__all__ = ["TpchDiseasystore"]
