from nans_clip_tpu.deploy.aot import (compile_tower, export_stablehlo,
                                      load_stablehlo)

__all__ = ["compile_tower", "export_stablehlo", "load_stablehlo"]
