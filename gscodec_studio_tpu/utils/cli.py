"""Minimal dataclass -> argparse CLI (stand-in for the reference's tyro
dependency, simple_trainer.py:1555-1576; tyro is not available in this
environment). Supports flat dataclasses with bool/int/float/str/Optional and
tuple fields, plus named preset configs."""

from __future__ import annotations

import argparse
import dataclasses
import typing
from typing import Dict, Optional, Type, TypeVar

T = TypeVar("T")


def _add_field(parser: argparse.ArgumentParser, f: dataclasses.Field, default):
    name = "--" + f.name.replace("_", "-")
    ftype = f.type
    origin = typing.get_origin(ftype)
    args = typing.get_args(ftype)
    if ftype in (bool, "bool") or (origin is typing.Union and bool in args):
        parser.add_argument(
            name, type=lambda s: s.lower() in ("1", "true", "yes"),
            default=default, nargs="?", const=True,
        )
    elif origin in (tuple, list):
        elem = args[0] if args else str
        parser.add_argument(name, type=elem, nargs="*", default=default)
    elif origin is typing.Union:  # Optional[x]
        elem = next((a for a in args if a is not type(None)), str)
        parser.add_argument(name, type=elem, default=default)
    else:
        base = ftype if isinstance(ftype, type) else str
        parser.add_argument(name, type=base, default=default)


def parse_config(
    config_cls: Type[T],
    presets: Optional[Dict[str, T]] = None,
    argv=None,
) -> T:
    parser = argparse.ArgumentParser()
    if presets:
        parser.add_argument("preset", choices=sorted(presets), nargs="?")
        ns0, rest = parser.parse_known_args(argv)
        base = presets[ns0.preset] if ns0.preset else config_cls()
        argv = rest
    else:
        base = config_cls()
    parser2 = argparse.ArgumentParser()
    for f in dataclasses.fields(config_cls):
        _add_field(parser2, f, getattr(base, f.name))
    ns = parser2.parse_args(argv)
    return dataclasses.replace(base, **vars(ns))
