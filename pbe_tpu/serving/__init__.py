from pbe_tpu.serving.server import EditServer

__all__ = ["EditServer"]
