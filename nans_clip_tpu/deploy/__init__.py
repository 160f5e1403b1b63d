from nans_clip_tpu.deploy.aot import (compile_tower, export_stablehlo,
                                      load_stablehlo)
from nans_clip_tpu.deploy.coreml import export_coreml

__all__ = ["compile_tower", "export_stablehlo", "load_stablehlo",
           "export_coreml"]
