from cookieblock_consent_classifier_spark.functions import native, text, vectorized

__all__ = ["native", "text", "vectorized"]
