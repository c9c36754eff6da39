"""Container-level probing for the codecs we honestly don't decode.

MP3 (MPEG-1/2 audio) and MP4 (ISO base media / ISO 14496-12) carry
their structure in public container formats that need no DSP to parse:
an MP3 is a walk of self-describing frame headers, an MP4 a tree of
length-prefixed boxes. ``probe_mp3`` / ``probe_mp4`` extract the
metadata a curation pipeline filters on (duration, rates, codec ids,
track dimensions, sample counts) without decoding a single audio/video
sample — the ffprobe role, from scratch against the public specs. The
Spark stage ``probe_media`` runs them Arrow-batched over a media table.

Payload DECODE for these formats still raises NotImplementedError
(multimodal.DECODERS) — probing metadata is not decoding media, and the
distinction is kept explicit.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# ------------------------------------------------------------------ MP3

# MPEG-1 Layer III bitrate table (kbps), index 1-14 (public: ISO 11172-3)
_BITRATE_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
# MPEG-2/2.5 Layer III
_BITRATE_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_SAMPLERATE = {
    3: [44100, 48000, 32000],  # MPEG-1
    2: [22050, 24000, 16000],  # MPEG-2
    0: [11025, 12000, 8000],   # MPEG-2.5
}


def probe_mp3(payload: bytes) -> dict:
    """Walk MPEG audio frames -> {frames, duration_sec, sample_rate,
    bitrate_kbps (modal), vbr}. Skips an ID3v2 prefix (syncsafe size);
    resyncs on garbage between frames; Layer III only (the 'MP3' in
    MP3). Raises ValueError when no valid frame is found."""
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        size = 0
        for b in payload[6:10]:  # syncsafe u28
            size = (size << 7) | (b & 0x7F)
        pos = 10 + size
    frames = 0
    duration = 0.0
    bitrates: dict[int, int] = {}
    sample_rate = None
    while pos + 4 <= len(payload):
        b0, b1, b2, _b3 = payload[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            pos += 1  # resync
            continue
        version = (b1 >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (b1 >> 1) & 0x3    # 1 == Layer III
        if version == 1 or layer != 1:
            pos += 1
            continue
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        padding = (b2 >> 1) & 0x1
        if br_idx in (0, 15) or sr_idx == 3:
            pos += 1
            continue
        table = _BITRATE_V1_L3 if version == 3 else _BITRATE_V2_L3
        kbps = table[br_idx]
        sr = _SAMPLERATE[version][sr_idx]
        spf = 1152 if version == 3 else 576  # samples per frame, LSF halves
        frame_len = (spf // 8) * kbps * 1000 // sr + padding
        if frame_len <= 4 or pos + frame_len > len(payload):
            break
        frames += 1
        duration += spf / sr
        bitrates[kbps] = bitrates.get(kbps, 0) + 1
        sample_rate = sr
        pos += frame_len
    if frames == 0:
        raise ValueError("no valid MPEG audio frame found")
    modal = max(bitrates, key=lambda k: bitrates[k])
    return {
        "frames": frames,
        "duration_sec": round(duration, 4),
        "sample_rate": sample_rate,
        "bitrate_kbps": modal,
        "vbr": len(bitrates) > 1,
    }


# ------------------------------------------------------------------ MP4


def _boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for ISO-BMFF boxes in range."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        btype = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box header")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos  # box extends to end of enclosing scope
        if size < hdr or pos + size > end:
            raise ValueError(f"bad box size {size} for {btype!r}")
        yield btype, pos + hdr, pos + size
        pos += size


def _first(data, start, end, btype):
    for t, s, e in _boxes(data, start, end):
        if t == btype:
            return s, e
    return None


def probe_mp4(payload: bytes) -> dict:
    """ISO-BMFF box walk -> {brand, duration_sec, tracks:[{kind, codec,
    width, height, n_samples, timescale}]}. Parses ftyp/moov(mvhd,
    trak(tkhd, mdia(mdhd, hdlr, minf/stbl(stsd, stsz)))); mdat is
    skipped untouched (that's the media). Raises ValueError on a
    malformed tree."""
    end = len(payload)
    brand = None
    out_tracks = []
    duration_sec = None
    moov = None
    for t, s, e in _boxes(payload, 0, end):
        if t == b"ftyp":
            brand = payload[s : s + 4].decode("latin1")
        elif t == b"moov":
            moov = (s, e)
    if moov is None:
        raise ValueError("MP4 missing moov box")
    s, e = moov
    mvhd = _first(payload, s, e, b"mvhd")
    if mvhd:
        ms, _me = mvhd
        ver = payload[ms]
        if ver == 1:
            timescale = struct.unpack_from(">I", payload, ms + 20)[0]
            dur = struct.unpack_from(">Q", payload, ms + 24)[0]
        else:
            timescale = struct.unpack_from(">I", payload, ms + 12)[0]
            dur = struct.unpack_from(">I", payload, ms + 16)[0]
        duration_sec = round(dur / timescale, 4) if timescale else None
    for t, ts_, te in _boxes(payload, s, e):
        if t != b"trak":
            continue
        track = {"kind": None, "codec": None, "width": 0, "height": 0,
                 "n_samples": 0, "timescale": 0}
        tkhd = _first(payload, ts_, te, b"tkhd")
        if tkhd:
            ks, ke = tkhd
            # width/height: 16.16 fixed point, last 8 bytes of the box
            track["width"] = struct.unpack_from(">I", payload, ke - 8)[0] >> 16
            track["height"] = struct.unpack_from(">I", payload, ke - 4)[0] >> 16
        mdia = _first(payload, ts_, te, b"mdia")
        if not mdia:
            out_tracks.append(track)
            continue
        ms, me = mdia
        mdhd = _first(payload, ms, me, b"mdhd")
        if mdhd:
            hs, _he = mdhd
            ver = payload[hs]
            track["timescale"] = struct.unpack_from(
                ">I", payload, hs + (20 if ver == 1 else 12)
            )[0]
        hdlr = _first(payload, ms, me, b"hdlr")
        if hdlr:
            hs, _he = hdlr
            handler = payload[hs + 8 : hs + 12]
            track["kind"] = {b"vide": "video", b"soun": "audio"}.get(
                handler, handler.decode("latin1")
            )
        minf = _first(payload, ms, me, b"minf")
        if minf:
            fs, fe = minf
            stbl = _first(payload, fs, fe, b"stbl")
            if stbl:
                bs, be = stbl
                stsd = _first(payload, bs, be, b"stsd")
                if stsd:
                    ds, _de = stsd
                    n_entries = struct.unpack_from(">I", payload, ds + 4)[0]
                    if n_entries:
                        track["codec"] = payload[ds + 12 : ds + 16].decode("latin1")
                stsz = _first(payload, bs, be, b"stsz")
                if stsz:
                    zs, _ze = stsz
                    track["n_samples"] = struct.unpack_from(">I", payload, zs + 8)[0]
        out_tracks.append(track)
    return {"brand": brand, "duration_sec": duration_sec, "tracks": out_tracks}


# ----------------------------------------------------------- Spark stage

PROBE_DDL = (
    "media_id long, kind string, container string, duration_sec double, "
    "sample_rate int, bitrate_kbps int, n_tracks int, codec string, "
    "width int, height int, probe_err string"
)


def probe_media(media: DataFrame) -> DataFrame:
    """Arrow-batched container probe over a media table (multimodal
    schema). Recognizes MP3 (frame walk / ID3) and MP4 (box walk); rows
    whose payload is neither probeable nor recognized carry probe_err
    instead of failing the task — one bad blob in a 100 TB corpus must
    not kill the job."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                payload = bytes(payload)
                row = {
                    "media_id": int(media_id), "kind": kind, "container": None,
                    "duration_sec": None, "sample_rate": None,
                    "bitrate_kbps": None, "n_tracks": None, "codec": None,
                    "width": None, "height": None, "probe_err": None,
                }
                try:
                    if payload[:3] == b"ID3" or (
                        len(payload) > 1
                        and payload[0] == 0xFF
                        and (payload[1] & 0xE0) == 0xE0
                    ):
                        m = probe_mp3(payload)
                        row.update(
                            container="mp3",
                            duration_sec=m["duration_sec"],
                            sample_rate=m["sample_rate"],
                            bitrate_kbps=m["bitrate_kbps"],
                        )
                    elif len(payload) >= 12 and payload[4:8] == b"ftyp":
                        m = probe_mp4(payload)
                        vid = next(
                            (t for t in m["tracks"] if t["kind"] == "video"), None
                        )
                        row.update(
                            container=f"mp4/{m['brand']}",
                            duration_sec=m["duration_sec"],
                            n_tracks=len(m["tracks"]),
                            codec=vid["codec"] if vid else (
                                m["tracks"][0]["codec"] if m["tracks"] else None
                            ),
                            width=vid["width"] if vid else None,
                            height=vid["height"] if vid else None,
                        )
                    else:
                        row["probe_err"] = "unrecognized container"
                except Exception as e:  # noqa: BLE001 — per-row fail-soft
                    row["probe_err"] = f"{type(e).__name__}: {e}"[:200]
                rows.append(row)
            yield pd.DataFrame(rows)

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=PROBE_DDL
    )


# ------------------------------------------------- deterministic fixtures

def mp3_frame(bitrate_idx: int = 9, kbps: int = 128, sr: int = 44100,
              padding: int = 0) -> bytes:
    """One valid MPEG-1 Layer III frame (header + zero payload) — the
    spec arithmetic from ISO 11172-3: frame_len = 144*kbps*1000/sr."""
    b2 = (bitrate_idx << 4) | (0 << 2) | (padding << 1)
    header = bytes([0xFF, 0xFB, b2, 0x00])
    frame_len = 144 * kbps * 1000 // sr + padding
    return header + b"\x00" * (frame_len - 4)


def fake_mp3(media_id: int) -> bytes:
    """Deterministic MP3 payload keyed by media_id: odd sequence ids are
    VBR with an ID3v2 prefix (2 frames @128 + 1..3 @160), even ids CBR
    at a bitrate cycling 128/160/192/224 with 3..7 frames."""
    seq = media_id // 6
    if seq % 2:
        id3 = b"ID3\x03\x00\x00" + bytes([0, 0, 0, 20]) + b"\x00" * 20
        return id3 + mp3_frame(9, 128) * 2 + mp3_frame(10, 160) * (1 + seq % 3)
    idx, kbps = [(9, 128), (10, 160), (11, 192), (12, 224)][seq % 4]
    return mp3_frame(idx, kbps) * (3 + seq % 5)


def _mp4_box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body


def fake_mp4(media_id: int) -> bytes:
    """Deterministic single-video-track MP4 keyed by media_id: dims
    320+16s × 180+9s, movie duration (1200+120s)/600 s, avc1 stsd entry,
    24+s samples (s = media_id // 6). Hand-assembled from ISO 14496-12
    box layouts — no muxer library."""
    seq = media_id // 6
    width, height = 320 + 16 * seq, 180 + 9 * seq
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"mp42")
    mvhd = _mp4_box(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
        + struct.pack(">II", 600, 1200 + 120 * seq) + b"\x00" * 80,
    )
    tkhd = _mp4_box(
        b"tkhd",
        b"\x00\x00\x00\x07" + b"\x00" * 72
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _mp4_box(
        b"mdhd",
        b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
        + struct.pack(">II", 12288, 24576) + b"\x00" * 4,
    )
    hdlr = _mp4_box(b"hdlr", b"\x00\x00\x00\x00" + b"\x00" * 4 + b"vide" + b"\x00" * 12)
    avc1 = struct.pack(">I", 16) + b"avc1" + b"\x00" * 8
    stsd = _mp4_box(b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 1) + avc1)
    stsz = _mp4_box(b"stsz", b"\x00\x00\x00\x00" + struct.pack(">II", 0, 24 + seq))
    stbl = _mp4_box(b"stbl", stsd + stsz)
    minf = _mp4_box(b"minf", stbl)
    mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
    trak = _mp4_box(b"trak", tkhd + mdia)
    moov = _mp4_box(b"moov", mvhd + trak)
    mdat = _mp4_box(b"mdat", b"\x00" * 32)
    return ftyp + moov + mdat


def inventory_fixture(spark, n: int = 48, partitions: int = 4) -> DataFrame:
    """Deterministic all-format media table: media_id % 6 rotates
    BMP / PNG / JPEG / WAV / MP3 / MP4, each blob fully derived from
    media_id — the driver-checked m1_media_inventory query decodes it
    back and compares against the frozen expected-metadata oracle."""
    from .multimodal import MEDIA_DDL, _fake_bmp, _fake_jpeg, _fake_png, _fake_wav

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        makers = [
            ("image", _fake_bmp), ("image", _fake_png), ("image", _fake_jpeg),
            ("audio", _fake_wav), ("audio", fake_mp3), ("video", fake_mp4),
        ]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind, maker = makers[i % 6]
                rows.append({
                    "media_id": i, "kind": kind, "payload": maker(i),
                    "meta": {"width": 0, "height": 0, "n_frames": 0,
                             "sample_rate": 0},
                })
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=MEDIA_DDL)


# --------------------------------------------------------- inventory stage

INVENTORY_DDL = (
    "media_id long, fmt string, width int, height int, sample_rate int, "
    "duration_sec double, bitrate_kbps int, codec string, err string"
)


def _inventory_row(payload: bytes) -> dict:
    """Magic-byte dispatch: REAL decode for BMP/PNG/JPEG (dims) and WAV
    (rate + duration), container probe for MP3/MP4. Pure function so the
    Spark stage and tests share it."""
    from .multimodal import _PNG_SIG, decode_bmp, decode_png, decode_wav
    from .jpeg import decode_jpeg

    out = {"fmt": None, "width": None, "height": None, "sample_rate": None,
           "duration_sec": None, "bitrate_kbps": None, "codec": None,
           "err": None}
    if payload[:2] == b"BM":
        px = decode_bmp(payload)
        out.update(fmt="bmp", height=px.shape[0], width=px.shape[1])
    elif payload[: len(_PNG_SIG)] == _PNG_SIG:
        px = decode_png(payload)
        out.update(fmt="png", height=px.shape[0], width=px.shape[1])
    elif payload[:2] == b"\xff\xd8":
        px = decode_jpeg(payload)
        out.update(fmt="jpeg", height=px.shape[0], width=px.shape[1])
    elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        samples, sr = decode_wav(payload)
        out.update(fmt="wav", sample_rate=sr,
                   duration_sec=round(samples.shape[0] / sr, 4))
    elif payload[:3] == b"ID3" or (
        len(payload) > 1 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0
    ):
        m = probe_mp3(payload)
        out.update(fmt="mp3", sample_rate=m["sample_rate"],
                   duration_sec=m["duration_sec"],
                   bitrate_kbps=m["bitrate_kbps"])
    elif len(payload) >= 12 and payload[4:8] == b"ftyp":
        m = probe_mp4(payload)
        vid = next((t for t in m["tracks"] if t["kind"] == "video"), None)
        out.update(fmt="mp4", duration_sec=m["duration_sec"],
                   codec=vid["codec"] if vid else None,
                   width=vid["width"] if vid else None,
                   height=vid["height"] if vid else None)
    else:
        out["err"] = "unrecognized container"
    return out


def media_inventory(media: DataFrame) -> DataFrame:
    """One Arrow-batched pass over a media table that turns every blob
    into the metadata row a curation filter needs (format, dims, rate,
    duration, codec) — real from-scratch decode where we have the codec,
    container probe where we honestly don't. Per-row fail-soft: a
    corrupt blob carries err, never kills the task."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                row = {"media_id": int(media_id), "fmt": None, "width": None,
                       "height": None, "sample_rate": None,
                       "duration_sec": None, "bitrate_kbps": None,
                       "codec": None, "err": None}
                try:
                    row.update(_inventory_row(bytes(payload)))
                except Exception as e:  # noqa: BLE001 — per-row fail-soft
                    row["err"] = f"{type(e).__name__}: {e}"[:200]
                rows.append(row)
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(run, schema=INVENTORY_DDL)
