"""Typed config tree with OpenCV-XML compatibility.

The reference configures every module through per-module XML files written/read
with ``CvFileStorage`` — ``saveConfig()`` on the first frame (self-documenting
defaults) and ``loadConfig()`` every frame (live-editable), e.g.
``package_bgs/FrameDifferenceBGS.cpp:63-83`` and ``FrameProcessor.cpp:496-610``.

Here each algorithm/module config is a frozen dataclass whose **field names are
the reference's XML parameter names verbatim** (camelCase), so existing
``config/*.xml`` files import unchanged.  Configs are static w.r.t. JIT: they are
hashable pytree-static objects baked into the compiled step function.  (Live
per-frame reload is host-side: reload the XML, rebuild the config, and a cached
re-jit picks it up — see ``runner/pipeline.py``.)
"""

from __future__ import annotations

import dataclasses
import os
import xml.etree.ElementTree as ET
from typing import Any, Type, TypeVar

T = TypeVar("T")


@dataclasses.dataclass(frozen=True)
class BGSConfig:
    """Base class for all algorithm configs. Frozen ⇒ hashable ⇒ jit-static."""

    # Name of the reference XML file this config round-trips with, e.g.
    # "FrameDifferenceBGS" → ./config/FrameDifferenceBGS.xml.
    xml_name: str = dataclasses.field(default="", init=False, repr=False)

    def replace(self: T, **kwargs: Any) -> T:
        return dataclasses.replace(self, **kwargs)


def _parse_value(text: str, pytype: type) -> Any:
    text = (text or "").strip()
    if pytype is bool:
        # CvFileStorage writes bools as ints (cvWriteInt of a bool).
        return bool(int(float(text)))
    if pytype is int:
        return int(float(text))
    if pytype is float:
        return float(text)
    if text.startswith('"') and text.endswith('"') and len(text) >= 2:
        return text[1:-1]  # CvFileStorage quotes strings ("" = empty)
    return text


def _format_value(value: Any) -> str:
    if isinstance(value, bool):
        return str(int(value))
    if isinstance(value, float):
        # CvFileStorage writes reals with a trailing period style; plain repr is
        # accepted by both sides.
        return repr(value)
    return str(value)


def config_from_xml(cls: Type[T], path: str, **overrides: Any) -> T:
    """Build a config dataclass from an OpenCV-storage XML file.

    Missing parameters fall back to dataclass defaults (mirrors
    ``cvReadIntByName(fs, 0, name, default)`` semantics,
    ``FrameDifferenceBGS.cpp:74-83``). Unknown XML entries are ignored.
    """
    values: dict[str, Any] = {}
    if path and os.path.exists(path):
        root = ET.parse(path).getroot()
        # OpenCV storage: <opencv_storage><param>value</param>...</opencv_storage>
        fields = {f.name: f for f in dataclasses.fields(cls) if f.init}
        for child in root:
            if child.tag in fields:
                ftype = fields[child.tag].type
                pytype = {"bool": bool, "int": int, "float": float, "str": str}.get(
                    ftype if isinstance(ftype, str) else ftype.__name__, str
                )
                values[child.tag] = _parse_value(child.text, pytype)
    values.update(overrides)
    return cls(**values)


def config_to_xml(config: Any, path: str) -> None:
    """Write a config dataclass as OpenCV-storage XML (``saveConfig`` parity)."""
    root = ET.Element("opencv_storage")
    for f in dataclasses.fields(config):
        if not f.init:
            continue
        el = ET.SubElement(root, f.name)
        el.text = _format_value(getattr(config, f.name))
    tree = ET.ElementTree(root)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(b'<?xml version="1.0"?>\n')
        tree.write(fh)
        fh.write(b"\n")
