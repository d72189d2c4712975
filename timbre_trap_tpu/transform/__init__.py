from .design import SlicqPlan, design_slicq, hz_to_midi, midi_to_hz
from .nsgt import build_slicq_fns
from .cqt import CQT

__all__ = [
    "SlicqPlan",
    "design_slicq",
    "build_slicq_fns",
    "hz_to_midi",
    "midi_to_hz",
    "CQT",
]
