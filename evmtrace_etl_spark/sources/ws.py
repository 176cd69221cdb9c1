"""Minimal RFC 6455 WebSocket client (stdlib sockets) for the S4 head
subscription (reference src/consumer/ws/mod.rs:28-49).

Scope: exactly what an ``eth_subscribe("newHeads")`` feeder needs —
client handshake (Sec-WebSocket-Key/-Accept per RFC 6455 §4), masked
client→server text frames (§5.2-5.3), server frame parsing including
fragmentation, ping→pong and close handling (§5.5).  No extensions, no
subprotocols, no compression.  ``wss://`` wraps the socket with the
stdlib ``ssl`` default context.

This is connector code (SURVEY §2.1): the engine boundary stays
``frames_to_df`` — WsHeadSource only turns the subscription into an
iterator of head dicts.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import socket
import ssl
import struct
from collections.abc import Iterator
from urllib.parse import urlparse

#: RFC 6455 §1.3 handshake GUID (public constant from the RFC)
_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_CONT, OP_TEXT, OP_BIN = 0x0, 0x1, 0x2
OP_CLOSE, OP_PING, OP_PONG = 0x8, 0x9, 0xA


def accept_key(client_key: str) -> str:
    """Sec-WebSocket-Accept for a client key (RFC 6455 §4.2.2)."""
    digest = hashlib.sha1((client_key + _WS_GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("websocket closed mid-frame")
        buf += chunk
    return buf


def encode_frame(opcode: int, payload: bytes, mask: bool) -> bytes:
    """One unfragmented frame (FIN set).  Clients MUST mask (§5.3)."""
    head = bytes([0x80 | opcode])
    n = len(payload)
    mask_bit = 0x80 if mask else 0
    if n < 126:
        head += bytes([mask_bit | n])
    elif n < (1 << 16):
        head += bytes([mask_bit | 126]) + struct.pack(">H", n)
    else:
        head += bytes([mask_bit | 127]) + struct.pack(">Q", n)
    if not mask:
        return head + payload
    key = os.urandom(4)
    masked = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return head + key + masked


def read_frame(sock: socket.socket) -> tuple[int, bool, bytes]:
    """→ (opcode, fin, unmasked payload) for the next frame on the wire."""
    b0, b1 = _read_exact(sock, 2)
    fin = bool(b0 & 0x80)
    opcode = b0 & 0x0F
    masked = bool(b1 & 0x80)
    n = b1 & 0x7F
    if n == 126:
        (n,) = struct.unpack(">H", _read_exact(sock, 2))
    elif n == 127:
        (n,) = struct.unpack(">Q", _read_exact(sock, 8))
    key = _read_exact(sock, 4) if masked else None
    payload = _read_exact(sock, n)
    if key:
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return opcode, fin, payload


class WsClient:
    """Blocking WebSocket client: connect/handshake, text send/receive,
    transparent ping→pong, graceful close."""

    def __init__(self, url: str, timeout: float = 30.0):
        self.url = url
        self.timeout = timeout
        self._sock: socket.socket | None = None

    def connect(self) -> None:
        u = urlparse(self.url)
        if u.scheme not in ("ws", "wss"):
            raise ValueError(f"not a websocket url: {self.url}")
        host = u.hostname or "localhost"
        port = u.port or (443 if u.scheme == "wss" else 80)
        sock = socket.create_connection((host, port), timeout=self.timeout)
        if u.scheme == "wss":  # pragma: no cover — no TLS peer in tests
            sock = ssl.create_default_context().wrap_socket(
                sock, server_hostname=host
            )
        key = base64.b64encode(os.urandom(16)).decode()
        path = u.path or "/"
        if u.query:
            path += "?" + u.query
        request = (
            f"GET {path} HTTP/1.1\r\n"
            f"Host: {host}:{port}\r\n"
            "Upgrade: websocket\r\n"
            "Connection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\n"
            "Sec-WebSocket-Version: 13\r\n"
            "\r\n"
        )
        sock.sendall(request.encode())
        response = b""
        while b"\r\n\r\n" not in response:
            chunk = sock.recv(4096)
            if not chunk:
                raise ConnectionError("handshake: connection closed")
            response += chunk
        status, _, rest = response.partition(b"\r\n")
        if b"101" not in status:
            raise ConnectionError(f"handshake rejected: {status.decode()}")
        headers = {}
        for line in rest.split(b"\r\n"):
            name, sep, value = line.decode(errors="replace").partition(":")
            if sep:
                headers[name.strip().lower()] = value.strip()
        if headers.get("sec-websocket-accept") != accept_key(key):
            raise ConnectionError("handshake: bad Sec-WebSocket-Accept")
        self._sock = sock

    def send_text(self, text: str) -> None:
        assert self._sock is not None, "not connected"
        self._sock.sendall(encode_frame(OP_TEXT, text.encode(), mask=True))

    def recv_text(self) -> str | None:
        """Next text message (reassembling fragments); None on close.
        Pings are answered inline; pongs are ignored (§5.5)."""
        assert self._sock is not None, "not connected"
        parts: list[bytes] = []
        while True:
            opcode, fin, payload = read_frame(self._sock)
            if opcode == OP_PING:
                self._sock.sendall(encode_frame(OP_PONG, payload, mask=True))
                continue
            if opcode == OP_PONG:
                continue
            if opcode == OP_CLOSE:
                try:
                    self._sock.sendall(
                        encode_frame(OP_CLOSE, payload[:2], mask=True)
                    )
                except OSError:  # peer already gone
                    pass
                return None
            if opcode in (OP_TEXT, OP_BIN, OP_CONT):
                parts.append(payload)
                if fin:
                    return b"".join(parts).decode()

    def close(self) -> None:
        if self._sock is None:
            return
        try:
            self._sock.sendall(encode_frame(OP_CLOSE, b"\x03\xe8", mask=True))
        except OSError:
            pass
        finally:
            self._sock.close()
            self._sock = None


class WsHeadSource:
    """S4 — ``eth_subscribe(newHeads)`` as an iterator of head dicts
    (reference src/consumer/ws/mod.rs:39-49: subscribe, then stream
    notifications; connect errors retried by the caller's policy).

    ``max_heads`` bounds the iteration (None = until the server closes).
    Each yielded head feeds ``RpcClient.get_block`` / ``trace_block`` and
    ``frames_to_df`` exactly like the reference's per-head loop
    (ws/mod.rs:81-103).
    """

    def __init__(
        self,
        ws_url: str,
        max_heads: int | None = None,
        client_factory=WsClient,
    ):
        self.ws_url = ws_url
        self.max_heads = max_heads
        self._factory = client_factory

    def __iter__(self) -> Iterator[dict]:
        client = self._factory(self.ws_url)
        client.connect()
        try:
            client.send_text(
                json.dumps(
                    {
                        "id": 1,
                        "jsonrpc": "2.0",
                        "method": "eth_subscribe",
                        "params": ["newHeads"],
                    }
                )
            )
            ack_raw = client.recv_text()
            if ack_raw is None:
                raise ConnectionError("server closed before subscribe ack")
            ack = json.loads(ack_raw)
            if "result" not in ack:
                raise ConnectionError(f"subscribe rejected: {ack_raw}")
            sub_id = ack["result"]
            seen = 0
            while self.max_heads is None or seen < self.max_heads:
                raw = client.recv_text()
                if raw is None:
                    break
                msg = json.loads(raw)
                if (
                    msg.get("method") == "eth_subscription"
                    and msg.get("params", {}).get("subscription") == sub_id
                ):
                    yield msg["params"]["result"]
                    seen += 1
        finally:
            client.close()
