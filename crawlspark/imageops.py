"""Image fetch/decode stage — Arrow-batched pandas UDFs over binary columns.

The reference downloads each image with a per-row requests.get
(crawler.py:585-596) and the legacy path decodes with cv2
(legacy/crawler_legacy.py:326-328). Here:

- *fetch* is relational: the image frontier joins the synthetic
  ``page_store`` on url (tests) — in production this stage would be the
  same ``mapInPandas`` HTTP fetcher as posts. No UDF needed for fixtures.
- *decode* is one pandas UDF batch over (bytes, fmt) -> struct(w, h,
  phash, ok, psnr_db). Decoding an opaque codec is genuinely non-relational
  (SURVEY §2.9 decode_image_udf); the codecs themselves are the
  deterministic stand-ins from crawlspark.codec (no image libs in the
  sandbox — plumbing/schema/batching are the real thing).

Scale note (SURVEY §7.3): `bytes` never travels through a shuffle — the
fetch join broadcasts the small frontier side onto the payload table (or
co-partitions by url), and decode runs in the same stage as the fetch so
only (w,h,fmt,phash) columns continue downstream.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawlspark import codec

DECODED = T.StructType(
    [
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("phash", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("psnr_db", T.DoubleType()),
        # OCR stand-in text (legacy:322-330 analog; codec.fake_ocr)
        T.StructField("ocr_text", T.StringType()),
    ]
)


@F.pandas_udf(DECODED)
def decode_image_udf(data: pd.Series, fmt: pd.Series) -> pd.DataFrame:
    """bytes+fmt -> (w, h, phash, ok, psnr_db). psnr_db compares the decode
    against a re-encode roundtrip (inf for lossless; for the fake lossy
    codec the roundtrip is idempotent, so this reports the codec's own
    fidelity floor ceiling: inf once quantized)."""
    ws, hs, ph, oks, ps, ocr = [], [], [], [], [], []
    for b, f in zip(data, fmt):
        try:
            px = codec.decode_image(bytes(b), f)
            ws.append(px.shape[1])
            hs.append(px.shape[0])
            ph.append(codec.phash64(px))
            rt = codec.decode_image(codec.encode_image(px, f), f)
            ps.append(codec.psnr(px, rt))
            ocr.append(codec.fake_ocr(px))
            oks.append(True)
        except Exception:
            ws.append(None)
            hs.append(None)
            ph.append(None)
            ps.append(None)
            ocr.append(None)
            oks.append(False)
    return pd.DataFrame(
        {
            "w": pd.array(ws, dtype="Int32"),
            "h": pd.array(hs, dtype="Int32"),
            "phash": pd.array(ph, dtype="Int64"),
            "ok": oks,
            "psnr_db": pd.array(ps, dtype="float64"),
            "ocr_text": ocr,
        }
    )
