from pbe_tpu.serving.server import (DeadlineExceeded, EditServer,
                                    ServerOverloaded)

__all__ = ["EditServer", "ServerOverloaded", "DeadlineExceeded"]
