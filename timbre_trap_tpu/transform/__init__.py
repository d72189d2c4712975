from .design import (SlicqPlan, design_cqt_pytorch, design_slicq, hz_to_midi,
                     midi_to_hz)
from .nsgt import build_slicq_fns
from .cqt import CQT
from .calibrate import (identify_transform, load_tables, save_tables,
                        tables_from_cqt_pytorch)

__all__ = [
    "SlicqPlan",
    "design_slicq",
    "design_cqt_pytorch",
    "build_slicq_fns",
    "hz_to_midi",
    "midi_to_hz",
    "CQT",
    "identify_transform",
    "tables_from_cqt_pytorch",
    "save_tables",
    "load_tables",
]
