from codem_spark.functions import cells, geo, text

__all__ = ["cells", "geo", "text"]
