from .torch_import import (export_torch_state_dict, import_torch_state_dict,
                           load_torch_checkpoint)

__all__ = ["import_torch_state_dict", "export_torch_state_dict",
           "load_torch_checkpoint"]
