"""Codec registry — the engine's extension surface (SURVEY.md §2.2)."""

from .base import Codec
from .bitpack import BitpackCodec
from .cascade import CascadeCodec
from .delta import DeltaCodec
from .dictionary import DictCodec
from .doubledelta import DoubleDeltaCodec
from .forref import ForCodec
from .fsst import FsstCodec
from .plain import PlainCodec
from .rle import RleCodec

REGISTRY: dict[str, Codec] = {
    c.id: c for c in (PlainCodec(), RleCodec(), BitpackCodec(), ForCodec(),
                      DictCodec(), FsstCodec(), DeltaCodec(),
                      DoubleDeltaCodec(), CascadeCodec())
}

__all__ = ["Codec", "REGISTRY", "PlainCodec", "RleCodec", "BitpackCodec",
           "ForCodec", "DictCodec", "FsstCodec", "DeltaCodec",
           "DoubleDeltaCodec", "CascadeCodec"]
