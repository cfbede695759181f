"""Multimodal binary columns: typed metadata, decode, resize, frame-sample.

Image/audio/video payloads ride as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched mapInPandas operators (task brief
"multimodal columns"). The real codecs (PIL/ffmpeg) are not in this
container, so decoding is STUBBED two ways:

- ``codec="real"`` raises NotImplementedError (the marked stub), and
- ``codec="fake"`` (default) parses the deterministic fake container
  format below, making all Spark-side plumbing — schema, partitioning,
  UDF signatures, batch shapes, explode semantics — real and testable.

Fake container format (little-endian):
    magic   4 bytes  b"IMG!" | b"AUD!" | b"VID!"
    width   uint32   (images/video; sample-rate for audio)
    height  uint32   (images/video; n-samples for audio)
    frames  uint32   (video; 1 otherwise)
    body    frames * 16 bytes of deterministic content hash material
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = {"image": b"IMG!", "audio": b"AUD!", "video": b"VID!"}
_HEADER_FMT = "<4sIII"
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)  # 16

META_SCHEMA = ("kind string, width int, height int, n_frames int, "
               "n_bytes int, valid boolean")


def fake_payload(kind: str, width: int, height: int, frames: int = 1,
                 seed: int = 0) -> bytes:
    """Deterministic fake media payload (fixture generator)."""
    body = b"".join(
        struct.pack("<IIII", seed, i, width, height) for i in range(frames))
    return struct.pack(_HEADER_FMT, MAGIC[kind], width, height, frames) + body


def _parse_header(payload: bytes):
    if len(payload) < _HEADER_SIZE:
        return None
    magic, w, h, fr = struct.unpack_from(_HEADER_FMT, payload, 0)
    kind = {v: k for k, v in MAGIC.items()}.get(magic)
    if kind is None:
        return None
    return kind, w, h, fr


def extract_meta(media: DataFrame, payload_col: str = "payload",
                 codec: str = "fake") -> DataFrame:
    """Add typed metadata columns decoded from the binary payload."""
    if codec == "real":
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg (not in this "
            "environment); use codec='fake' for the deterministic stub")

    in_fields = [f"{f.name} {f.dataType.simpleString()}"
                 for f in media.schema.fields]
    out_schema = ", ".join(in_fields + [META_SCHEMA])
    names = [f.name for f in media.schema.fields]

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds, ws, hs, frs, nb, ok = [], [], [], [], [], []
            for p in pdf[payload_col].values:
                b = bytes(p)
                hdr = _parse_header(b)
                nb.append(len(b))
                if hdr is None:
                    kinds.append(None); ws.append(0); hs.append(0)
                    frs.append(0); ok.append(False)
                else:
                    kinds.append(hdr[0]); ws.append(hdr[1])
                    hs.append(hdr[2]); frs.append(hdr[3]); ok.append(True)
            yield pdf[names].assign(kind=kinds, width=ws, height=hs,
                                    n_frames=frs, n_bytes=nb, valid=ok)

    return media.mapInPandas(_meta, schema=out_schema)


def resize_images(media: DataFrame, max_side: int,
                  payload_col: str = "payload",
                  codec: str = "fake") -> DataFrame:
    """'Resize' images: halve dimensions until max side <= max_side.

    Fake codec rewrites the header (body untouched) — the real
    implementation would re-encode pixels; the plumbing (binary in,
    binary out, per-batch) is identical.
    """
    if codec == "real":
        raise NotImplementedError("real resize needs PIL — stubbed")

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in media.schema.fields)
    names = [f.name for f in media.schema.fields]

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[payload_col].values:
                b = bytes(p)
                hdr = _parse_header(b)
                if hdr is None or hdr[0] != "image":
                    out.append(b)
                    continue
                _, w, h, fr = hdr
                while max(w, h) > max_side:
                    w, h = max(w // 2, 1), max(h // 2, 1)
                out.append(struct.pack("<4sIII", b"IMG!", w, h, fr)
                           + b[16:])
            pdf = pdf.copy()
            pdf[payload_col] = out
            yield pdf[names]

    return media.mapInPandas(_resize, schema=out_schema)


def sample_frames(media: DataFrame, every_n: int,
                  id_col: str = "url", payload_col: str = "payload",
                  codec: str = "fake") -> DataFrame:
    """Video -> one row per sampled frame (UDTF explode semantics,
    the multimodal analog of the reference's multi-geometry explode
    loop, Data.groovy:210-218)."""
    if codec == "real":
        raise NotImplementedError("real frame sampling needs ffmpeg — stubbed")

    schema = f"{id_col} string, frame_idx int, frame binary"

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for rid, p in zip(pdf[id_col].values, pdf[payload_col].values):
                b = bytes(p)
                hdr = _parse_header(b)
                if hdr is None or hdr[0] != "video":
                    continue
                _, w, h, fr = hdr
                for i in range(0, fr, every_n):
                    off = 16 + i * 16
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(b[off:off + 16])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs,
                                "frame": frames})

    return media.mapInPandas(_frames, schema=schema)
