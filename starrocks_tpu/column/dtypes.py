"""Logical type system for the engine.

Analog of StarRocks' type system (be/src/types/, be/src/column/field.h), cut
down to what a TPU engine natively supports: every logical type maps to a
fixed-width device representation.

  BOOL      -> bool_
  INT32     -> int32
  INT64     -> int64
  FLOAT64   -> float64 (post-aggregation math only; avoid in hot scans)
  DECIMAL   -> int64 fixed-point with static `scale` (StarRocks decimalv3,
               be/src/column/decimalv3_column.h — we use 64-bit because TPC-H
               needs <= scale 6 and dual-limb summation handles overflow)
  DATE      -> int32 days since 1970-01-01 (StarRocks DateColumn)
  STRING    -> int32 dictionary code; dictionary values live host-side in a
               registry (analog of global dict, be/src/runtime/global_dict/).
               Dictionaries are lexicographically sorted at build time so code
               order == string order (comparisons and ORDER BY stay on-device).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax.numpy as jnp
import numpy as np


class TypeKind(enum.Enum):
    BOOL = "bool"
    INT32 = "int32"
    INT64 = "int64"
    FLOAT64 = "float64"
    DECIMAL = "decimal"
    DATE = "date"
    STRING = "string"


@dataclasses.dataclass(frozen=True)
class DataType:
    kind: TypeKind
    scale: int = 0  # decimal scale (digits after the point); 0 otherwise

    def __post_init__(self):
        if self.kind is not TypeKind.DECIMAL and self.scale != 0:
            raise ValueError(f"scale only valid for DECIMAL, got {self}")

    @property
    def np_dtype(self) -> np.dtype:
        return np.dtype(_STORAGE[self.kind])

    @property
    def jnp_dtype(self):
        return _STORAGE[self.kind]

    @property
    def is_string(self) -> bool:
        return self.kind is TypeKind.STRING

    @property
    def is_decimal(self) -> bool:
        return self.kind is TypeKind.DECIMAL

    @property
    def is_integer(self) -> bool:
        return self.kind in (TypeKind.INT32, TypeKind.INT64)

    @property
    def is_numeric(self) -> bool:
        return self.kind in (
            TypeKind.INT32,
            TypeKind.INT64,
            TypeKind.FLOAT64,
            TypeKind.DECIMAL,
        )

    def __repr__(self):
        if self.kind is TypeKind.DECIMAL:
            return f"DECIMAL(s={self.scale})"
        return self.kind.name


_STORAGE = {
    TypeKind.BOOL: jnp.bool_,
    TypeKind.INT32: jnp.int32,
    TypeKind.INT64: jnp.int64,
    TypeKind.FLOAT64: jnp.float64,
    TypeKind.DECIMAL: jnp.int64,
    TypeKind.DATE: jnp.int32,
    TypeKind.STRING: jnp.int32,
}

BOOL = DataType(TypeKind.BOOL)
INT32 = DataType(TypeKind.INT32)
INT64 = DataType(TypeKind.INT64)
FLOAT64 = DataType(TypeKind.FLOAT64)
DATE = DataType(TypeKind.DATE)
STRING = DataType(TypeKind.STRING)


def DECIMAL(scale: int) -> DataType:
    return DataType(TypeKind.DECIMAL, scale=scale)


# ---------------------------------------------------------------------------
# String dictionary registry (host side).
#
# Column pytrees must have hashable static metadata for jit caching, so the
# dictionary values (a numpy str array) are interned here and referenced by a
# stable integer id. Two identical value arrays get the same id.
# ---------------------------------------------------------------------------

_DICT_REGISTRY: dict[int, np.ndarray] = {}
_DICT_IDS: dict[bytes, int] = {}
_NEXT_DICT_ID = [1]


def register_dict(values: np.ndarray) -> int:
    """Intern a sorted string dictionary; returns its stable id."""
    values = np.asarray(values)
    key = values.tobytes() + str(values.dtype).encode()
    did = _DICT_IDS.get(key)
    if did is None:
        did = _NEXT_DICT_ID[0]
        _NEXT_DICT_ID[0] += 1
        _DICT_IDS[key] = did
        _DICT_REGISTRY[did] = values
    return did


def dict_values(dict_id: int) -> np.ndarray:
    return _DICT_REGISTRY[dict_id]


def dict_encode(raw: np.ndarray) -> tuple[np.ndarray, int]:
    """Dictionary-encode a host string array.

    Returns (codes int32, dict_id). The dictionary is sorted so that
    code order == lexicographic order.
    """
    values, codes = np.unique(np.asarray(raw), return_inverse=True)
    return codes.astype(np.int32), register_dict(values)


def dict_decode(codes: np.ndarray, dict_id: int) -> np.ndarray:
    return dict_values(dict_id)[np.asarray(codes)]


def dict_code_of(dict_id: int, literal: str) -> Optional[int]:
    """Find the code for a string literal, or None if absent.

    Used to turn `col = 'LITERAL'` into an int compare on device.
    """
    values = dict_values(dict_id)
    i = int(np.searchsorted(values, literal))
    if i < len(values) and values[i] == literal:
        return i
    return None
