"""Regenerate tests/fixtures/multimodal_expected.parquet — the committed
expected-values oracle for the multimodal_decode_resize contract query.

One row per doc_id (0..N_DOCS-1, covering every sf the driver uses) with the
deterministic codec pipeline's outputs: encode -> decode -> (w, h, phash) ->
2x2 mean-pool thumbnail -> thumb_phash. Rerun after any crawlspark.codec
change: python scripts/gen_multimodal_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawlspark import codec  # noqa: E402

N_DOCS = 20_000
_FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)
OUT = os.path.join(_FIXDIR, "multimodal_expected.parquet")
OUT_FRAMES = os.path.join(_FIXDIR, "frames_expected.parquet")


def main() -> None:
    cols: dict[str, list] = {k: [] for k in (
        "doc_id", "n_bytes", "w", "h", "fmt", "phash", "thumb_phash")}
    for did in range(N_DOCS):
        fmt = "png" if did % 2 == 0 else "jpeg"
        px = codec.synth_pixels(f"doc{did}", 16, 16)
        data = codec.encode_image(px, fmt)
        dec = codec.decode_image(data, fmt)
        thumb = dec.reshape(8, 2, 8, 2, 3).mean(axis=(1, 3)).astype("uint8")
        cols["doc_id"].append(did)
        cols["n_bytes"].append(len(data))
        cols["w"].append(dec.shape[1])
        cols["h"].append(dec.shape[0])
        cols["fmt"].append(fmt)
        cols["phash"].append(codec.phash64(dec))
        cols["thumb_phash"].append(codec.phash64(thumb))
    t = pa.table(
        {
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "n_bytes": pa.array(cols["n_bytes"], pa.int32()),
            "w": pa.array(cols["w"], pa.int32()),
            "h": pa.array(cols["h"], pa.int32()),
            "fmt": pa.array(cols["fmt"], pa.string()),
            "phash": pa.array(cols["phash"], pa.int64()),
            "thumb_phash": pa.array(cols["thumb_phash"], pa.int64()),
        }
    )
    pq.write_table(t, OUT)
    print(f"wrote {t.num_rows} rows to {OUT}")

    # frames_expected: every FRAME_STEP-th frame of the packed raw-RGB
    # stand-in video (multimodal_frame_sample's oracle)
    from crawlspark.pipeline_ops import FRAME_H, FRAME_STEP, FRAME_W, N_FRAMES

    fr: dict[str, list] = {"doc_id": [], "frame_idx": [], "phash": []}
    for did in range(N_DOCS):
        for j in range(0, N_FRAMES, FRAME_STEP):
            px = codec.synth_pixels(f"doc{did}_f{j}", FRAME_W, FRAME_H)
            fr["doc_id"].append(did)
            fr["frame_idx"].append(j)
            fr["phash"].append(codec.phash64(px))
    tf = pa.table(
        {
            "doc_id": pa.array(fr["doc_id"], pa.int64()),
            "frame_idx": pa.array(fr["frame_idx"], pa.int32()),
            "phash": pa.array(fr["phash"], pa.int64()),
        }
    )
    pq.write_table(tf, OUT_FRAMES)
    print(f"wrote {tf.num_rows} rows to {OUT_FRAMES}")


if __name__ == "__main__":
    main()
