"""Engine configuration — defaults <- INI overlay <- env overlay, typed.

Re-expresses the reference's layered config system (src/config.py:
defaults 34-90, INI file overlay 92-114, env-var overlay with typed
coercion 116-155, validation 157-169) for the engine's knobs. Same
semantics, engine-appropriate keys:

- values start from dataclass defaults,
- an INI file's ``[crawlspark]`` section overrides them,
- ``CRAWLSPARK_<KEY>`` environment variables override the INI,
- every overlay value is coerced to the default's type (bool accepts
  true/false/1/0/yes/no; lists are comma-split and stripped),
- ``validate()`` rejects non-positive budgets and unknown enums.
"""

from __future__ import annotations

import configparser
import dataclasses
import os
from dataclasses import dataclass, field

ENV_PREFIX = "CRAWLSPARK_"
INI_SECTION = "crawlspark"

_TRUE = {"1", "true", "yes", "on"}
_FALSE = {"0", "false", "no", "off"}


@dataclass
class EngineConfig:
    # site / fetch (reference config.py:44-47, 58, 67)
    base_url: str = "https://weolbu.example.com"
    user_agent: str = "crawlspark/1.0"
    request_timeout: int = 20
    # politeness (config.py:70-77)
    wait_page_load: float = 3.0
    wait_post_nav: float = 3.0
    wait_between_pages: float = 1.0
    rate_limit_requests: int = 5
    rate_limit_period: float = 10.0
    # retries (config.py:87-89)
    max_retries: int = 3
    retry_delay: float = 5.0
    # filters (config.py:83-85)
    excluded_extensions: list[str] = field(
        default_factory=lambda: ["jpg", "jpeg", "png", "gif", "svg"]
    )
    # engine knobs (SURVEY §7)
    max_pages: int = 0  # 0 = unbounded (stop on empty page)
    pages_per_wave: int = 0  # 0 = single wave
    # per-post checkpoint cadence (legacy/crawler_legacy.py:1180 checkpoints
    # after every post): commit every K posts within a wave; 0 = wave-atomic
    posts_per_checkpoint: int = 0
    host_buckets: int = 32
    hot_host_salts: int = 4
    listing_source: str = "render"  # render | api | auto
    image_keep_bytes: bool = True
    # strategy-0 user CSS selector (download_detector.py:286-306); empty =
    # disabled. Honored down to the final simple selector (`tag.c1.c2`) —
    # the engine matches stored page source, not a live DOM.
    download_selector: str = ""
    # snapshot retention wired into the commit lifecycle: keep at most this
    # many snapshots per state table, expiring older ones + orphaned data
    # dirs as the crawl commits. 0 = keep full history (every version
    # time-travelable)
    vacuum_keep_last: int = 8
    # run the INCREMENTAL image near-dup pass (imagededup.dedup_images)
    # every K completed waves, plus a final catch-up run after the loop.
    # Each run costs O(images added since the last run) — the pass keeps
    # its own processed-version state, so the cadence only controls
    # freshness, never correctness. 0 = never (offline `cli dedup-images`
    # remains available)
    image_dedup_every_waves: int = 0

    # ------------------------------------------------------------- loading

    @classmethod
    def load(
        cls,
        ini_path: str | None = None,
        env: dict[str, str] | None = None,
    ) -> "EngineConfig":
        cfg = cls()
        if ini_path:
            parser = configparser.ConfigParser()
            if not parser.read(ini_path):
                raise FileNotFoundError(ini_path)
            if parser.has_section(INI_SECTION):
                for key, raw in parser.items(INI_SECTION):
                    cfg._set_coerced(key, raw, f"ini:{ini_path}")
        env = os.environ if env is None else env
        for f in dataclasses.fields(cls):
            raw = env.get(ENV_PREFIX + f.name.upper())
            if raw is not None:
                cfg._set_coerced(f.name, raw, "env")
        cfg.validate()
        return cfg

    def _set_coerced(self, key: str, raw: str, src: str) -> None:
        names = {f.name for f in dataclasses.fields(self)}
        if key not in names:
            raise KeyError(f"unknown config key {key!r} from {src}")
        default = getattr(type(self)(), key)
        setattr(self, key, _coerce(raw, default, key, src))

    def validate(self) -> None:
        if self.rate_limit_requests < 1:
            raise ValueError("rate_limit_requests must be >= 1")
        for k in ("rate_limit_period", "retry_delay", "request_timeout"):
            if getattr(self, k) <= 0:
                raise ValueError(f"{k} must be positive")
        for k in ("wait_page_load", "wait_post_nav", "wait_between_pages"):
            if getattr(self, k) < 0:
                raise ValueError(f"{k} must be >= 0")
        if self.max_retries < 1:
            raise ValueError("max_retries must be >= 1")
        if self.listing_source not in ("render", "api", "auto"):
            raise ValueError(f"unknown listing_source {self.listing_source!r}")
        if self.host_buckets < 1 or self.hot_host_salts < 1:
            raise ValueError("host_buckets/hot_host_salts must be >= 1")
        if self.posts_per_checkpoint < 0:
            raise ValueError("posts_per_checkpoint must be >= 0")
        if self.vacuum_keep_last < 0:
            raise ValueError("vacuum_keep_last must be >= 0")
        if self.image_dedup_every_waves < 0:
            raise ValueError("image_dedup_every_waves must be >= 0")


def _coerce(raw: str, default, key: str, src: str):
    raw = raw.strip()
    if isinstance(default, bool):  # before int: bool is an int subclass
        low = raw.lower()
        if low in _TRUE:
            return True
        if low in _FALSE:
            return False
        raise ValueError(f"{key} from {src}: {raw!r} is not a boolean")
    if isinstance(default, int):
        return int(raw.replace(",", ""))
    if isinstance(default, float):
        return float(raw)
    if isinstance(default, list):
        return [x.strip() for x in raw.split(",") if x.strip()]
    return raw
