from consistencytta_tpu.models.pipeline import Pipeline, PipelineParams

__all__ = ["Pipeline", "PipelineParams"]
