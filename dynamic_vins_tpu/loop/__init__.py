from dynamic_vins_tpu.loop.closure import (KeyframeDatabase,
                                           LoopCloser,
                                           LoopClosureConfig, LoopEdge)

__all__ = ["KeyframeDatabase", "LoopCloser", "LoopClosureConfig",
           "LoopEdge"]
