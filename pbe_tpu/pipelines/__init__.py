from pbe_tpu.pipelines.inference import EditPipeline

__all__ = ["EditPipeline"]
