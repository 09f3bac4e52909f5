"""MQTT wildcard pattern → regex compiler.

Reproduces the matching semantics of the reference's subscription dispatch
(``MQTTPattern.matches(sub.subject, cdcMsg.channel)`` at
``/root/reference/lib/nats.js:94``, via the ``mqtt-pattern`` dependency,
``package.json:11``):

- patterns and topics are ``/``-separated segment lists;
- ``+`` (or ``+name`` — the name is only a capture label) matches exactly
  one non-empty segment;
- ``#`` (or ``#name``) matches the entire remainder (zero or more
  segments) and is only valid as the final pattern segment;
- every other segment must match literally.

Compilation happens once at plan-build time on the driver; the result is an
ordinary ``rlike`` predicate, so Catalyst constant-folds it and it rides the
scan like any other filter — the O(subscriptions × messages) interpreted
loop of the reference (``lib/nats.js:92-96``) becomes a single vectorized
predicate per subscription.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F


def mqtt_to_regex(pattern: str) -> str:
    """Compile an MQTT wildcard pattern to an anchored regex string."""
    parts: list[str] = []
    segments = pattern.split("/")
    for i, seg in enumerate(segments):
        if seg.startswith("#"):
            if i != len(segments) - 1:
                raise ValueError(f"'#' must be the last segment: {pattern!r}")
            # '#' consumes the remainder including the preceding separator
            # (so 'a/#' matches 'a' itself per mqtt-pattern semantics).
            if parts:
                parts[-1] += "(/.*)?"
            else:
                parts.append(".*")
            return "^" + "/".join(parts) + "$"
        if seg.startswith("+"):
            parts.append("[^/]+")
        else:
            parts.append(re.escape(seg))
    return "^" + "/".join(parts) + "$"


def matches(pattern: str, topic: str) -> bool:
    """Pure-Python matcher (used by property tests as an independent check
    and by streaming drivers for small registry scans)."""
    p_segs = pattern.split("/")
    t_segs = topic.split("/")
    for i, p in enumerate(p_segs):
        if p.startswith("#"):
            return i == len(p_segs) - 1
        if i >= len(t_segs):
            return False
        if p.startswith("+"):
            if t_segs[i] == "":
                return False
            continue
        if p != t_segs[i]:
            return False
    return len(t_segs) == len(p_segs)


def channel_matches(channel: Column | str, pattern: str) -> Column:
    """DataFrame predicate: does ``channel`` match the MQTT ``pattern``?

    Plain literal patterns (no wildcard) compile to an equality comparison so
    Catalyst can push an exact parquet filter instead of a regex."""
    col = F.col(channel) if isinstance(channel, str) else channel
    if "+" not in pattern and "#" not in pattern:
        return col == F.lit(pattern)
    return col.rlike(mqtt_to_regex(pattern))
