from nans_clip_tpu.deploy.aot import (compile_tower, export_stablehlo,
                                      load_stablehlo)
from nans_clip_tpu.deploy.coreml import export_coreml
from nans_clip_tpu.deploy.engine import load_engine, save_engine

__all__ = ["compile_tower", "export_stablehlo", "load_stablehlo",
           "export_coreml", "save_engine", "load_engine"]
