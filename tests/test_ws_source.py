"""S4 WebSocket head source: the stdlib RFC 6455 client against an
in-process fake server — handshake (key/accept), masked client frames,
ping→pong, fragmented server messages, foreign-subscription filtering,
close handling — then the heads driven through the RPC feeder to the
engine boundary (frames_to_df)."""

from __future__ import annotations

import json
import socket
import threading

from evmtrace_etl_spark.sources.rpc import RpcClient, frames_to_df
from evmtrace_etl_spark.sources.ws import (
    OP_CLOSE,
    OP_PONG,
    OP_TEXT,
    WsHeadSource,
    accept_key,
    encode_frame,
    read_frame,
)

HEADS = [
    {"number": "0x64", "hash": "0x" + "aa" * 32, "timestamp": "0x10"},
    {"number": "0x65", "hash": "0x" + "bb" * 32, "timestamp": "0x11"},
]


def _notify(sub_id: str, head: dict) -> bytes:
    msg = json.dumps(
        {
            "jsonrpc": "2.0",
            "method": "eth_subscription",
            "params": {"subscription": sub_id, "result": head},
        }
    )
    return encode_frame(OP_TEXT, msg.encode(), mask=False)


def _fragmented_text(payload: bytes) -> bytes:
    """The same text message split over a text + continuation frame
    (FIN=0 opcode=1, then FIN=1 opcode=0) — RFC 6455 §5.4."""
    half = len(payload) // 2
    a, b = payload[:half], payload[half:]
    return (
        bytes([0x01, len(a)]) + a + bytes([0x80, len(b)]) + b
    )


class FakeWsServer(threading.Thread):
    """One-connection newHeads endpoint speaking raw RFC 6455."""

    def __init__(self):
        super().__init__(daemon=True)
        self._lsock = socket.socket()
        self._lsock.bind(("127.0.0.1", 0))
        self._lsock.listen(1)
        self.port = self._lsock.getsockname()[1]
        self.got_pong = False
        self.got_client_close = False
        self.error: Exception | None = None

    def run(self):
        try:
            conn, _ = self._lsock.accept()
            conn.settimeout(15)
            # -- handshake ------------------------------------------------
            req = b""
            while b"\r\n\r\n" not in req:
                req += conn.recv(4096)
            key = next(
                line.split(b":", 1)[1].strip().decode()
                for line in req.split(b"\r\n")
                if line.lower().startswith(b"sec-websocket-key")
            )
            conn.sendall(
                (
                    "HTTP/1.1 101 Switching Protocols\r\n"
                    "Upgrade: websocket\r\n"
                    "Connection: Upgrade\r\n"
                    f"Sec-WebSocket-Accept: {accept_key(key)}\r\n\r\n"
                ).encode()
            )
            # -- subscribe ------------------------------------------------
            opcode, _fin, payload = read_frame(conn)
            assert opcode == OP_TEXT
            sub_req = json.loads(payload)
            assert sub_req["method"] == "eth_subscribe"
            ack = json.dumps({"id": sub_req["id"], "result": "0xsub1"})
            conn.sendall(encode_frame(OP_TEXT, ack.encode(), mask=False))
            # -- ping: client must pong while blocked in recv ------------
            conn.sendall(encode_frame(0x9, b"hb", mask=False))
            opcode, _fin, payload = read_frame(conn)
            self.got_pong = opcode == OP_PONG and payload == b"hb"
            # -- notifications -------------------------------------------
            conn.sendall(_notify("0xsub1", HEADS[0]))
            conn.sendall(_notify("0xother", {"number": "0xff"}))  # foreign
            frag = json.dumps(
                {
                    "jsonrpc": "2.0",
                    "method": "eth_subscription",
                    "params": {"subscription": "0xsub1", "result": HEADS[1]},
                }
            ).encode()
            conn.sendall(_fragmented_text(frag))
            # -- close ----------------------------------------------------
            opcode, _fin, _payload = read_frame(conn)  # client close
            self.got_client_close = opcode == OP_CLOSE
            conn.sendall(encode_frame(OP_CLOSE, b"\x03\xe8", mask=False))
            conn.close()
        except Exception as exc:  # surfaced by the test thread
            self.error = exc
        finally:
            self._lsock.close()


def test_ws_head_source_subscribes_and_streams(spark):
    server = FakeWsServer()
    server.start()
    src = WsHeadSource(f"ws://127.0.0.1:{server.port}/", max_heads=2)
    heads = list(src)
    server.join(timeout=15)
    assert server.error is None
    assert heads == HEADS  # foreign-subscription message filtered out
    assert server.got_pong  # ping answered mid-stream
    assert server.got_client_close  # graceful shutdown

    # drive one head through the RPC feeder to the engine boundary
    head_number = int(heads[0]["number"], 16)
    block = {
        "number": heads[0]["number"],
        "hash": heads[0]["hash"],
        "timestamp": heads[0]["timestamp"],
        "transactions": ["0x" + "11" * 32],
    }
    traced = [{"result": {"type": "CALL", "from": "0x" + "22" * 20,
                          "to": "0x" + "33" * 20, "calls": []}}]
    transport = {
        ("eth_getBlockByNumber", hex(head_number)): block,
        ("debug_traceBlockByNumber", hex(head_number)): traced,
    }
    client = RpcClient(lambda m, p: transport[(m, p[0])], sleep=lambda s: None)
    fetched = client.get_block(head_number)
    frames = frames_to_df(spark, 1, fetched, client.trace_block(head_number))
    rows = frames.collect()
    assert len(rows) == 1
    assert rows[0].block_number == head_number
    assert rows[0].transaction_index == 1
