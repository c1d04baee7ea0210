"""Minimal Redis (RESP2) client over stdlib sockets — base / ring /
cluster topologies, mirroring the reference's thin client-factory
wrapper (/root/reference/xredis/client.go:14-110).

The reference delegates to a full-featured Go client; here the engine
only needs the handful of commands its shared-throttle limiter and the
redis e2e scenario use (PING, GET, SET, INCRBY, EXPIRE), so the wire
protocol is implemented directly:

  request  = RESP array of bulk strings
  response = +simple | -error | :int | $bulk (nil = $-1) | *array

Topologies:
  base     one address, every command goes there
  ring     client-side sharding across addrs — rendezvous hashing on
           the key (deterministic, no coordination; adding a shard
           only remaps ~1/n of keys)
  cluster  server-side slots — CRC16(key) mod 16384, slot table
           discovered via CLUSTER SLOTS and refreshed on MOVED

No connection pooling: the engine's limiter sync is a periodic
driver-side batch of a few commands, not a hot path.  Timeouts and
bounded retries guard the pipeline against a dead/slow redis.
"""

from __future__ import annotations

import socket
import time
from dataclasses import dataclass, field


class RedisError(Exception):
    """Server-returned -ERR reply."""


class NilReply(Exception):
    """GET on a missing key ($-1) — the analogue of redis.Nil."""


class MovedError(RedisError):
    """Cluster -MOVED reply; carries the new slot owner address."""

    def __init__(self, slot: int, addr: str):
        super().__init__(f"MOVED {slot} {addr}")
        self.slot = slot
        self.addr = addr


CLIENT_TYPE_BASE = "base"
CLIENT_TYPE_RING = "ring"
CLIENT_TYPE_CLUSTER = "cluster"


@dataclass
class Options:
    """Reference Options (client.go:22-41); durations in seconds."""

    client_type: str = CLIENT_TYPE_BASE
    addrs: list[str] = field(default_factory=list)
    id: str = ""  # ring shard-name prefix
    password: str = ""
    read_timeout: float = 1.0
    write_timeout: float = 1.0
    max_retries: int = 0
    min_retry_backoff: float = 0.0
    max_retry_backoff: float = 0.0


def _parse_addr(addr: str) -> tuple[str, int]:
    host, _, port = addr.rpartition(":")
    return (host or "127.0.0.1", int(port))


def _encode_command(args: tuple) -> bytes:
    out = [b"*%d\r\n" % len(args)]
    for a in args:
        b = a if isinstance(a, bytes) else str(a).encode()
        out.append(b"$%d\r\n%s\r\n" % (len(b), b))
    return b"".join(out)


class _Conn:
    """One TCP connection with a buffered RESP reader."""

    def __init__(self, addr: str, opts: Options):
        self.sock = socket.create_connection(
            _parse_addr(addr), timeout=max(opts.read_timeout, 0.05)
        )
        self.buf = b""

    def close(self):
        try:
            self.sock.close()
        except OSError:
            pass

    def _read_line(self) -> bytes:
        while b"\r\n" not in self.buf:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("redis connection closed")
            self.buf += chunk
        line, self.buf = self.buf.split(b"\r\n", 1)
        return line

    def _read_exact(self, n: int) -> bytes:
        while len(self.buf) < n + 2:  # payload + trailing \r\n
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("redis connection closed")
            self.buf += chunk
        data, self.buf = self.buf[:n], self.buf[n + 2:]
        return data

    def _read_reply(self):
        line = self._read_line()
        kind, rest = line[:1], line[1:]
        if kind == b"+":
            return rest.decode()
        if kind == b"-":
            msg = rest.decode()
            if msg.startswith("MOVED "):
                _, slot, addr = msg.split(" ", 2)
                raise MovedError(int(slot), addr)
            raise RedisError(msg)
        if kind == b":":
            return int(rest)
        if kind == b"$":
            n = int(rest)
            if n == -1:
                return None
            return self._read_exact(n)
        if kind == b"*":
            n = int(rest)
            if n == -1:
                return None
            return [self._read_reply() for _ in range(n)]
        raise RedisError(f"unexpected RESP type byte {kind!r}")

    def execute(self, *args):
        self.sock.sendall(_encode_command(args))
        return self._read_reply()


def _rendezvous_pick(key: str, shards: list[str]) -> int:
    """Highest-random-weight shard choice: deterministic, and removing
    a shard only remaps the keys that lived on it."""
    import hashlib

    best, best_i = None, 0
    for i, name in enumerate(shards):
        h = hashlib.md5(f"{name}\x00{key}".encode()).digest()
        score = int.from_bytes(h[:8], "big")
        if best is None or score > best:
            best, best_i = score, i
    return best_i


# CRC16/CCITT (XMODEM) — the polynomial redis cluster key slots use;
# table-free bitwise form (public algorithm).
def crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x1021) if crc & 0x8000 else (crc << 1)
        crc &= 0xFFFF
    return crc


def key_slot(key: str) -> int:
    """Cluster slot: CRC16 over the hash tag ({...} substring when
    present, else the whole key), mod 16384."""
    k = key.encode()
    start = k.find(b"{")
    if start != -1:
        end = k.find(b"}", start + 1)
        if end > start + 1:
            k = k[start + 1:end]
    return crc16(k) % 16384


class Client:
    """Command surface shared by all three topologies."""

    def __init__(self, opts: Options):
        if not opts.addrs:
            raise ValueError("xredis: at least one address required")
        self.opts = opts
        self._conns: dict[str, _Conn] = {}

    # -- routing (overridden per topology) -----------------------------
    def _addr_for(self, key: str | None) -> str:
        return self.opts.addrs[0]

    def _conn(self, addr: str) -> _Conn:
        conn = self._conns.get(addr)
        if conn is None:
            conn = _Conn(addr, self.opts)
            if self.opts.password:
                conn.execute("AUTH", self.opts.password)
            self._conns[addr] = conn
        return conn

    def close(self):
        for c in self._conns.values():
            c.close()
        self._conns.clear()

    def _execute(self, key: str | None, *args):
        """Route + run with bounded retries on connection failure."""
        last_err: Exception | None = None
        for attempt in range(self.opts.max_retries + 1):
            addr = self._addr_for(key)
            try:
                return self._conn(addr).execute(*args)
            except (OSError, ConnectionError) as e:
                self._conns.pop(addr, None)
                last_err = e
                backoff = min(
                    self.opts.min_retry_backoff * (2**attempt),
                    self.opts.max_retry_backoff,
                )
                if backoff > 0:
                    time.sleep(backoff)
        raise ConnectionError(f"redis unreachable at {addr}: {last_err}")

    # -- commands -------------------------------------------------------
    def ping(self) -> bool:
        return self._execute(None, "PING") == "PONG"

    def set(self, key: str, value, ex: float | None = None) -> bool:
        args = ["SET", key, value]
        if ex is not None:
            args += ["PX", int(ex * 1000)]
        return self._execute(key, *args) == "OK"

    def get(self, key: str) -> bytes | None:
        """None on missing key (the reference checks redis.Nil)."""
        return self._execute(key, "GET", key)

    def incrby(self, key: str, amount: int) -> int:
        return self._execute(key, "INCRBY", key, int(amount))

    def expire(self, key: str, seconds: float) -> bool:
        return self._execute(key, "PEXPIRE", key, int(seconds * 1000)) == 1


class BaseClient(Client):
    pass


class RingClient(Client):
    """Client-side sharding; shard names are '{id}_{i}' like the
    reference's ring addrs map (client.go:63-67)."""

    def __init__(self, opts: Options):
        super().__init__(opts)
        self._shards = [f"{opts.id}_{i}" for i in range(len(opts.addrs))]

    def _addr_for(self, key: str | None) -> str:
        if key is None:  # keyless command (PING): first shard
            return self.opts.addrs[0]
        return self.opts.addrs[_rendezvous_pick(key, self._shards)]


class ClusterClient(Client):
    """Slot-routed client: the 16384-slot table is fetched lazily via
    CLUSTER SLOTS and refreshed when a node answers -MOVED."""

    def __init__(self, opts: Options):
        super().__init__(opts)
        self._slot_table: list[tuple[int, int, str]] = []  # (lo, hi, addr)

    def _refresh_slots(self):
        conn = self._conn(self.opts.addrs[0])
        reply = conn.execute("CLUSTER", "SLOTS") or []
        table = []
        for entry in reply:
            lo, hi, master = int(entry[0]), int(entry[1]), entry[2]
            host = master[0].decode() if isinstance(master[0], bytes) else master[0]
            table.append((lo, hi, f"{host}:{int(master[1])}"))
        if table:
            self._slot_table = sorted(table)

    def _addr_for(self, key: str | None) -> str:
        if key is None:
            return self.opts.addrs[0]
        if not self._slot_table:
            self._refresh_slots()
        slot = key_slot(key)
        for lo, hi, addr in self._slot_table:
            if lo <= slot <= hi:
                return addr
        return self.opts.addrs[0]

    def _execute(self, key, *args):
        try:
            return super()._execute(key, *args)
        except MovedError as e:
            # topology changed: refresh and retry once at the new owner
            self._refresh_slots()
            return self._conn(e.addr).execute(*args)


def new_client(opts: Options) -> Client:
    """Factory matching the reference's NewClient switch
    (client.go:100-110)."""
    kind = opts.client_type
    if kind == CLIENT_TYPE_BASE:
        return BaseClient(opts)
    if kind == CLIENT_TYPE_RING:
        return RingClient(opts)
    if kind == CLIENT_TYPE_CLUSTER:
        return ClusterClient(opts)
    raise ValueError(f"unknown redis client type: {kind!r}")
