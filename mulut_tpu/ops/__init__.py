from .ensemble import (
    lut_cascade_int,
    prepare_expanded_luts,
    round_half_even_div,
    stage_mix,
)
from .simplex import (
    reference_oracle_int,
    round_ste,
    simplex_interp_diff,
    simplex_interp_int,
    simplex_planes_expanded_int,
    simplex_planes_int,
)
from .taps import TAPS, PAD, mode_pad, mode_taps

__all__ = [
    "lut_cascade_int",
    "prepare_expanded_luts",
    "round_half_even_div",
    "stage_mix",
    "reference_oracle_int",
    "round_ste",
    "simplex_interp_diff",
    "simplex_interp_int",
    "simplex_planes_expanded_int",
    "simplex_planes_int",
    "TAPS",
    "PAD",
    "mode_pad",
    "mode_taps",
]
