"""Algorithm registry: name / ustc-type-id → algorithm class.

Mirrors the reference's two registration points:
- ``ustc_src/ustc_bgs.cpp:8-69`` — integer type ids 0..37 → IBGS implementations
  (24 is a hole: PBAS is commented out in the reference too).
- ``FrameProcessor.h:80-242`` — ``enableX`` flags keyed by algorithm name.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Type

_BY_NAME: Dict[str, type] = {}
_BY_TYPE_ID: Dict[int, type] = {}


def register(name: str, type_id: Optional[int] = None, aliases: Iterable[str] = ()):
    """Class decorator: register a BGS algorithm under its reference name."""

    def deco(cls: type) -> type:
        cls.name = name
        cls.type_id = type_id
        _BY_NAME[name.lower()] = cls
        for a in aliases:
            _BY_NAME[a.lower()] = cls
        if type_id is not None:
            _BY_TYPE_ID[type_id] = cls
        return cls

    return deco


def _ensure_populated() -> None:
    import tracking_tpu.bgs  # noqa: F401  (registers all algorithm modules)


def get_algorithm(key) -> type:
    """Look up an algorithm class by reference name, alias, or ustc type id."""
    _ensure_populated()
    if isinstance(key, int):
        if key not in _BY_TYPE_ID:
            raise KeyError(f"no BGS algorithm with ustc type id {key}")
        return _BY_TYPE_ID[key]
    k = str(key).lower()
    if k not in _BY_NAME:
        raise KeyError(
            f"no BGS algorithm named {key!r}; known: {sorted(set(_BY_NAME))}"
        )
    return _BY_NAME[k]


def list_algorithms() -> Dict[str, type]:
    _ensure_populated()
    return {cls.name: cls for cls in dict.fromkeys(_BY_NAME.values())}
