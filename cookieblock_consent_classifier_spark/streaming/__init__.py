from cookieblock_consent_classifier_spark.streaming.sessionize import (
    streaming_sessionize,
)

__all__ = ["streaming_sessionize"]
