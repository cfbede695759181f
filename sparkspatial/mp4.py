"""ISO base-media (MP4, ISO/IEC 14496-12) CONTAINER codec,
dependency-free.

The last multimodal gap after JPEG/PNG (r3 "What's missing" #1):
compressed video. Full H.264 pixel decode is a codec project out of
scope for an analytics engine, but everything a curation pipeline
does with video short of decoding pixels is CONTAINER work, and the
container is pure struct parsing:

- :func:`mp4_meta` — box-tree walk to (duration, track count,
  video width/height, codec fourccs, sample count): the metadata a
  crawl pipeline filters on (drop >10-min clips, non-AVC tracks...).
- :func:`mp4_sample_ranges` — the stsz/stsc/stco sample-table join:
  exact (sample_idx, byte_offset, size) for every sample of a track.
  This is the real sharding primitive (split a video corpus into
  per-sample records / hand GOP ranges to a decoder service) and the
  part people get wrong (stsc runs are first_chunk-delimited).
- :func:`encode_mp4_stub` — a spec-conformant minimal writer (ftyp +
  moov with mvhd/trak/tkhd/mdia/mdhd/hdlr/stbl + mdat) whose sample
  payloads are deterministic fake bytes: the box structure is real
  (any ISO-BMFF parser reads it), the codec content is not.
- :func:`encode_mp4_mjpeg` (r5) — the same writer with REAL motion-
  JPEG content: every mdat sample is a complete baseline JFIF image
  ('jpeg' sample entry), so sample extraction + the in-repo JPEG
  decoder give end-to-end compressed-video PIXEL decode
  (multimodal.sample_frames_mjpeg). The declared boundary shrinks to
  inter-frame codecs (AVC/HEVC) — the one remaining
  NotImplementedError in multimodal.py.

All functions return None for anything that does not parse — the
"invalid, never a crash" contract of the other codecs.
"""

from __future__ import annotations

import struct

__all__ = ["mp4_meta", "mp4_sample_ranges", "encode_mp4_stub",
           "encode_mp4_mjpeg"]


def _boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for the box sequence in
    buf[start:end] (size==1 -> 64-bit largesize; size==0 -> to end)."""
    pos = start
    while pos + 8 <= end:
        size, tag = struct.unpack_from(">I4s", buf, pos)
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                return
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            body = pos + 16
            if size < 16:       # inverted box (body_start > body_end)
                return
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            return
        yield tag, body, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, tag: bytes):
    for t, b, e in _boxes(buf, start, end):
        if t == tag:
            return b, e
    return None


def _full_box(buf: bytes, body: int):
    """(version, flags, payload_start) of a full box."""
    vf = struct.unpack_from(">I", buf, body)[0]
    return vf >> 24, vf & 0xFFFFFF, body + 4


def mp4_meta(payload: bytes):
    """Container metadata dict or None.

    Keys: duration_s (float, from mvhd), n_tracks, width, height
    (first video track's tkhd 16.16 fixed-point), video_codec /
    audio_codec (stsd fourcc, e.g. 'avc1'/'mp4a'), n_samples (video
    track's stsz count).
    """
    try:
        return _mp4_meta(payload)
    except (struct.error, IndexError, ValueError, ZeroDivisionError):
        return None


def _mp4_meta(payload: bytes):
    n = len(payload)
    ftyp = _find(payload, 0, n, b"ftyp")
    moov = _find(payload, 0, n, b"moov")
    if ftyp is None or moov is None:
        return None
    ms, me = moov
    mvhd = _find(payload, ms, me, b"mvhd")
    if mvhd is None:
        return None
    v, _, p = _full_box(payload, mvhd[0])
    if v == 1:
        _, _, timescale, duration = struct.unpack_from(">QQIQ", payload, p)
    else:
        _, _, timescale, duration = struct.unpack_from(">IIII", payload, p)
    if timescale == 0:
        return None
    meta = {"duration_s": duration / timescale, "n_tracks": 0,
            "width": 0, "height": 0, "video_codec": None,
            "audio_codec": None, "n_samples": 0}
    for t, b, e in _boxes(payload, ms, me):
        if t != b"trak":
            continue
        meta["n_tracks"] += 1
        tkhd = _find(payload, b, e, b"tkhd")
        mdia = _find(payload, b, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(payload, mdia[0], mdia[1], b"hdlr")
        kind = None
        if hdlr is not None:
            _, _, hp = _full_box(payload, hdlr[0])
            kind = payload[hp + 4:hp + 8]
        minf = _find(payload, mdia[0], mdia[1], b"minf")
        if minf is None:
            continue
        stbl = _find(payload, minf[0], minf[1], b"stbl")
        if stbl is None:
            continue
        stsd = _find(payload, stbl[0], stbl[1], b"stsd")
        fourcc = None
        if stsd is not None:
            _, _, sp = _full_box(payload, stsd[0])
            count = struct.unpack_from(">I", payload, sp)[0]
            if count >= 1:
                fourcc = payload[sp + 8:sp + 12].decode(
                    "ascii", "replace")
        if kind == b"vide":
            if fourcc and meta["video_codec"] is None:
                meta["video_codec"] = fourcc
            if tkhd is not None:
                v, _, tp = _full_box(payload, tkhd[0])
                # ...creation/mod/id/reserved/duration then 52 bytes of
                # reserved/matrix; width/height are the LAST 8 bytes of
                # the box, 16.16 fixed point — offset from the box END
                # is version-independent
                w_fp, h_fp = struct.unpack_from(">II", payload,
                                                tkhd[1] - 8)
                if meta["width"] == 0:
                    meta["width"] = w_fp >> 16
                    meta["height"] = h_fp >> 16
            stsz = _find(payload, stbl[0], stbl[1], b"stsz")
            if stsz is not None and meta["n_samples"] == 0:
                _, _, zp = _full_box(payload, stsz[0])
                _, cnt = struct.unpack_from(">II", payload, zp)
                meta["n_samples"] = cnt
        elif kind == b"soun" and fourcc and meta["audio_codec"] is None:
            meta["audio_codec"] = fourcc
    return meta


def mp4_sample_ranges(payload: bytes, track_kind: bytes = b"vide"):
    """[(sample_idx, offset, size)] for the first track of
    `track_kind`, from the stsz / stsc / stco(co64) join, or None.

    The stsc box stores RUNS: entry (first_chunk, samples_per_chunk,
    _desc) applies from first_chunk until the next entry's
    first_chunk — expanding the runs and walking chunks in order
    gives each sample's chunk; offsets accumulate within a chunk in
    sample order (ISO 14496-12 8.7.4/8.7.5).
    """
    try:
        return _sample_ranges(payload, track_kind)
    except (struct.error, IndexError, ValueError):
        return None


def _sample_ranges(payload: bytes, track_kind: bytes):
    n = len(payload)
    moov = _find(payload, 0, n, b"moov")
    if moov is None:
        return None
    for t, b, e in _boxes(payload, moov[0], moov[1]):
        if t != b"trak":
            continue
        mdia = _find(payload, b, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(payload, mdia[0], mdia[1], b"hdlr")
        if hdlr is None:
            continue
        _, _, hp = _full_box(payload, hdlr[0])
        if payload[hp + 4:hp + 8] != track_kind:
            continue
        minf = _find(payload, mdia[0], mdia[1], b"minf")
        stbl = _find(payload, minf[0], minf[1], b"stbl") \
            if minf else None
        if stbl is None:
            return None
        stsz = _find(payload, stbl[0], stbl[1], b"stsz")
        stsc = _find(payload, stbl[0], stbl[1], b"stsc")
        stco = _find(payload, stbl[0], stbl[1], b"stco")
        co64 = _find(payload, stbl[0], stbl[1], b"co64")
        if stsz is None or stsc is None or (stco is None
                                            and co64 is None):
            return None
        _, _, zp = _full_box(payload, stsz[0])
        default_size, cnt = struct.unpack_from(">II", payload, zp)
        if cnt > (1 << 20) or cnt > len(payload):
            # adversarial count: allocations below are O(cnt) lists,
            # so bound cnt by both a sanity cap (1M samples ≈ 10h of
            # 30fps video) and the file size itself — a 700-byte
            # payload cannot legitimately declare 16M samples
            # (r4 second-review finding: the old 2^24 cap still let
            # a tiny payload drive 2.3 GB of list allocation)
            return None
        if default_size:
            sizes = [default_size] * cnt
        else:
            sizes = list(struct.unpack_from(f">{cnt}I", payload,
                                            zp + 8))
        if stco is not None:
            _, _, cp = _full_box(payload, stco[0])
            nch = struct.unpack_from(">I", payload, cp)[0]
            offsets = list(struct.unpack_from(f">{nch}I", payload,
                                              cp + 4))
        else:
            _, _, cp = _full_box(payload, co64[0])
            nch = struct.unpack_from(">I", payload, cp)[0]
            offsets = list(struct.unpack_from(f">{nch}Q", payload,
                                              cp + 4))
        _, _, sp = _full_box(payload, stsc[0])
        nrun = struct.unpack_from(">I", payload, sp)[0]
        runs = [struct.unpack_from(">III", payload, sp + 4 + 12 * i)
                for i in range(nrun)]
        # expand runs -> samples-per-chunk for every chunk (clamp run
        # extents to the real chunk count: adversarial first_chunk
        # values must not expand GB-sized lists)
        spc = []
        for i, (first, per, _desc) in enumerate(runs):
            last = runs[i + 1][0] - 1 if i + 1 < nrun else nch
            last = min(last, nch)
            if first < 1 or first > last:
                return None
            spc.extend([per] * (last - first + 1))
        if len(spc) < nch:
            return None
        out = []
        si = 0
        for ci in range(nch):
            off = offsets[ci]
            for _ in range(spc[ci]):
                if si >= cnt:
                    break
                out.append((si, off, sizes[si]))
                off += sizes[si]
                si += 1
        if si != cnt:
            return None
        # every range must lie inside the file: a mid-mdat-truncated
        # payload must be rejected, not yield empty/partial sample
        # bytes from past-EOF slices (r4 second-review finding)
        if any(off + sz > n for _, off, sz in out):
            return None
        return out
    return None


def encode_mp4_stub(width: int, height: int, n_samples: int,
                    fps: int = 25, seed: int = 0,
                    samples_per_chunk: int = 3) -> bytes:
    """Minimal spec-conformant ISO-BMFF file with one 'vide' track
    ('avc1' sample entry) whose mdat samples are deterministic fake
    bytes (16 per sample, seeded) — the container is real, the codec
    payload is not (declared boundary). Samples group into chunks of
    `samples_per_chunk` so the stsc run logic is actually exercised.
    """
    samples = [struct.pack(">IIII", seed & 0xFFFFFFFF, i,
                           width, height)
               for i in range(n_samples)]
    return _encode_mp4_samples(width, height, samples, fps,
                               samples_per_chunk, b"avc1")


def encode_mp4_mjpeg(frames, fps: int = 25, quality: int = 85,
                     samples_per_chunk: int = 3) -> bytes:
    """uint8 (n, h, w, 3) RGB frames -> REAL motion-JPEG MP4 ('jpeg'
    sample entry, each mdat sample a complete baseline JFIF image) —
    r5, r4 verdict item 5: with the progressive/baseline JPEG decoder
    in place, MJPEG gives end-to-end compressed-video PIXEL decode
    with zero new entropy-coding machinery, shrinking the declared
    AVC stub to its true remainder (inter-frame codecs)."""
    import numpy as np

    from . import jpeg as _jpeg

    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    samples = [_jpeg.encode_jpeg(frames[i], quality=quality)
               for i in range(n)]
    return _encode_mp4_samples(w, h, samples, fps,
                               samples_per_chunk, b"jpeg")


def _encode_mp4_samples(width: int, height: int, samples: list,
                        fps: int, samples_per_chunk: int,
                        fourcc: bytes) -> bytes:
    """Shared ISO-BMFF writer: one 'vide' track whose stsd sample
    entry is `fourcc` and whose mdat holds `samples` verbatim."""
    n_samples = len(samples)

    def box(tag: bytes, body: bytes) -> bytes:
        return struct.pack(">I4s", 8 + len(body), tag) + body

    def full(tag: bytes, version: int, flags: int,
             body: bytes) -> bytes:
        return box(tag, struct.pack(">I", (version << 24) | flags)
                   + body)

    timescale = 1000
    duration = int(n_samples * timescale / fps)
    sizes = [len(s) for s in samples]

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512)
               + b"isomiso2mp41")

    # chunk layout
    chunks = [samples[i:i + samples_per_chunk]
              for i in range(0, n_samples, samples_per_chunk)]
    mdat_body = b"".join(b"".join(c) for c in chunks)
    # mdat follows ftyp + moov; compute moov size by building it with
    # placeholder offsets first (fixed-size stco), then rebuild
    def build_moov(chunk_offsets):
        # exact ISO 14496-12 v0 layouts (r4 second-review finding: an
        # earlier draft packed volume as 4 bytes / wrong reserved
        # lengths, shifting width/height off spec offsets for
        # third-party parsers): mvhd body = creation4 mod4 timescale4
        # duration4 rate4 volume2 res2 res8 matrix36 predefined24
        # next4 = 96; tkhd body = creation4 mod4 id4 res4 duration4
        # res8 layer2 alt2 volume2 res2 matrix36 w4 h4 = 80
        mvhd = full(b"mvhd", 0, 0,
                    struct.pack(">IIII", 0, 0, timescale, duration)
                    + struct.pack(">I", 0x00010000)       # rate 1.0
                    + struct.pack(">H", 0x0100)           # volume 1.0
                    + b"\x00" * 2 + b"\x00" * 8
                    + _identity_matrix() + b"\x00" * 24
                    + struct.pack(">I", 2))
        tkhd = full(b"tkhd", 0, 7,
                    struct.pack(">IIIII", 0, 0, 1, 0, duration)
                    + b"\x00" * 8
                    + struct.pack(">HHHH", 0, 0, 0, 0)
                    + _identity_matrix()
                    + struct.pack(">II", width << 16, height << 16))
        mdhd = full(b"mdhd", 0, 0, struct.pack(
            ">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0))
        hdlr = full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide"
                    + b"\x00" * 12 + b"sparkspatial\x00")
        entry = box(fourcc, b"\x00" * 6 + struct.pack(">H", 1)
                    + b"\x00" * 16
                    + struct.pack(">HH", width, height)
                    + struct.pack(">II", 0x00480000, 0x00480000)
                    + b"\x00" * 4 + struct.pack(">H", 1)
                    + b"\x00" * 32
                    + struct.pack(">Hh", 0x0018, -1))
        stsd = full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
        stts = full(b"stts", 0, 0, struct.pack(
            ">III", 1, n_samples, timescale // fps))
        # stsc must agree with the real chunk contents, including a
        # lone underfull chunk (r4 second-review finding: declaring
        # samples_per_chunk for a chunk holding fewer breaks strict
        # spec-offset parsers)
        if len(chunks) == 1:
            stsc_runs = [(1, len(chunks[0]), 1)]
        else:
            stsc_runs = [(1, samples_per_chunk, 1)]
            tail = len(chunks[-1])
            if tail != samples_per_chunk:
                stsc_runs.append((len(chunks), tail, 1))
        stsc = full(b"stsc", 0, 0, struct.pack(
            ">I", len(stsc_runs)) + b"".join(
            struct.pack(">III", *r) for r in stsc_runs))
        stsz = full(b"stsz", 0, 0, struct.pack(
            ">II", 0, n_samples) + b"".join(
            struct.pack(">I", s) for s in sizes))
        stco = full(b"stco", 0, 0, struct.pack(
            ">I", len(chunk_offsets)) + b"".join(
            struct.pack(">I", o) for o in chunk_offsets))
        stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
        vmhd = full(b"vmhd", 0, 1, b"\x00" * 8)
        dref = full(b"dref", 0, 0, struct.pack(">I", 1)
                    + full(b"url ", 0, 1, b""))
        dinf = box(b"dinf", dref)
        minf = box(b"minf", vmhd + dinf + stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        trak = box(b"trak", tkhd + mdia)
        return box(b"moov", mvhd + trak)

    moov0 = build_moov([0] * len(chunks))
    base = len(ftyp) + len(moov0) + 8          # mdat body start
    offs = []
    acc = base
    for c in chunks:
        offs.append(acc)
        acc += sum(len(s) for s in c)
    moov = build_moov(offs)
    assert len(moov) == len(moov0)
    return ftyp + moov + box(b"mdat", mdat_body)


def _identity_matrix() -> bytes:
    return struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0,
                       0, 0, 0x40000000)
