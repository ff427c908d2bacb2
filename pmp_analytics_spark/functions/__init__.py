from pmp_analytics_spark.functions import checksums, datetime_fmt, normalize, similarity, text

__all__ = ["checksums", "datetime_fmt", "normalize", "similarity", "text"]
