#!/usr/bin/env python
"""Ported `examples/cdc-pub.js` + `examples/cdc-sub.js` (reference CLIs):
publish CDCMsg envelopes and receive them through MQTT-pattern
subscriptions — same call shapes, same envelope fields
(`/root/reference/examples/cdc-pub.js:31-42`, `cdc-sub.js:29-31`), on the
engine's client facade. Runs self-contained on the in-process broker; swap
`LocalBroker` for the TCP transport in `sources/nats.py` against a real
NATS server.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from node_cdc_nats_spark.client import LocalBroker, connect, make_envelope


def main() -> list[str]:
    broker = LocalBroker()
    sub_client = connect(broker)          # cdc-sub.js: connect(opts, topic)
    pub_client = connect(broker)          # cdc-pub.js: connect(opts, topic)

    received: list[str] = []
    # cdc-sub.js:29-31 — subscribe(subject, callback)
    sub_client.subscribe(
        "device/+/temp",
        lambda m: received.append(f"{m['channel']}: {m['payload'].decode()}"),
    )

    for device, reading in ((7, "21.5"), (42, "19.0")):
        # cdc-pub.js:31-42 — build envelope, encode, publish
        env = make_envelope(f"device/{device}/temp", reading.encode())
        pub_client.publish(f"device/{device}/temp", env)

    pub_client.close()
    sub_client.close()
    return received


if __name__ == "__main__":
    for line in main():
        print(line)
