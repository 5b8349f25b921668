from cookieblock_consent_classifier_spark.runtime.checkpoints import (
    CheckpointedPipeline,
    StageResult,
)

__all__ = ["CheckpointedPipeline", "StageResult"]
