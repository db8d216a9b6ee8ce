"""CIFF / PISA format interoperability.

The reference (pisa-engine/ciff) is at heart a format-conversion
library; this subpackage reimplements its full conversion surface
(SURVEY.md §2.1/§2.2) and bridges it to the Ray-native index:

- :mod:`ciff_ray.interop.proto`   — CIFF protobuf wire codec (S1-S3, K4-K6)
- :mod:`ciff_ray.interop.pisaio`  — PISA binary collections + lexicons
  (S4-S8, S10-S11, K1, K7, M8, M9)
- :mod:`ciff_ray.interop.convert` — CiffToPisa / PisaToCiff / reorder /
  ScoreQuantizer (K2, K3, M1, M2, M6, O1, A1-A5, A7)
- :mod:`ciff_ray.interop.jsonl`   — JSONL impact vectors -> CIFF (S9, K8)
- :mod:`ciff_ray.interop.bridge`  — CIFF file <-> ciff_ray Ray index
"""

from ciff_ray.interop.convert import (
    CiffReader,
    CiffToPisa,
    CiffWriter,
    PisaToCiff,
    ScoreQuantizer,
    ciff_to_pisa,
    find_score_range,
    pisa_to_ciff,
)
from ciff_ray.interop.jsonl import jsonl_to_ciff
from ciff_ray.interop.proto import CiffDocRecord, CiffHeader, CiffPostingsList

__all__ = [
    "CiffDocRecord",
    "CiffHeader",
    "CiffPostingsList",
    "CiffReader",
    "CiffToPisa",
    "CiffWriter",
    "PisaToCiff",
    "ScoreQuantizer",
    "ciff_to_pisa",
    "find_score_range",
    "jsonl_to_ciff",
    "pisa_to_ciff",
]
