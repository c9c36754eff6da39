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
