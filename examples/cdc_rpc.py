#!/usr/bin/env python
"""Ported `examples/cdc-rpc.js` (reference CLI): first-response-wins RPC
with a timeout that RESOLVES to the 408 object
(`/root/reference/examples/cdc-rpc.js:31-33`, `lib/nats.js:196-256`), on
the engine's client facade.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from node_cdc_nats_spark.client import LocalBroker, connect, make_envelope


def main() -> tuple[str, dict]:
    broker = LocalBroker()
    client = connect(broker)

    # A responder service: answers requests on rpc/echo/req.
    responder = connect(broker)
    responder.subscribe(
        "rpc/echo/req",
        lambda m: responder.publish(
            "rpc/echo/res", make_envelope("rpc/echo/res", b"pong: " + m["payload"])
        ),
    )

    # cdc-rpc.js:31-33 — rpc(reqSub, resSubs.split(','), data, timeout)
    answered = client.rpc(
        "rpc/echo/req", "rpc/echo/res", make_envelope("rpc/echo/req", b"ping"),
        timeout=1,
    )
    timed_out = client.rpc(
        "rpc/nobody/req", ["rpc/nobody/res"], make_envelope("rpc/nobody/req", b"?"),
        timeout=0.01,
    )
    client.close()
    responder.close()
    return answered["payload"].decode(), timed_out


if __name__ == "__main__":
    answer, timeout_result = main()
    print("response:", answer)
    print("timeout :", timeout_result)
