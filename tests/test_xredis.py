"""xredis client vs the in-process MiniRedis RESP server — wire
protocol, topology routing, and the redis_clients e2e contract
(/root/reference/xredis/client.go, /root/reference/e2e/redis_clients)."""

import pytest

from file_d_spark.xredis import (
    CLIENT_TYPE_BASE,
    CLIENT_TYPE_CLUSTER,
    CLIENT_TYPE_RING,
    Options,
    key_slot,
    new_client,
)
from tests.util import MiniRedis


@pytest.fixture()
def mini():
    s = MiniRedis()
    yield s
    s.close()


def test_base_ping_set_get_incr_expire(mini):
    c = new_client(Options(client_type=CLIENT_TYPE_BASE, addrs=[mini.addr]))
    assert c.ping()
    assert c.set("k", "v")
    assert c.get("k") == b"v"
    assert c.get("missing") is None
    assert c.incrby("n", 5) == 5
    assert c.incrby("n", 2) == 7
    assert c.expire("n", 30)
    ttl = mini.ttl_ms("n")
    assert ttl is not None and 0 < ttl <= 30000
    c.close()


def test_set_with_expiry(mini):
    c = new_client(Options(addrs=[mini.addr]))
    assert c.set("tmp", "x", ex=0.05)
    assert c.get("tmp") == b"x"
    import time

    time.sleep(0.08)
    assert c.get("tmp") is None
    c.close()


def test_ring_routes_deterministically_and_covers_shards():
    a, b = MiniRedis(), MiniRedis()
    try:
        c = new_client(
            Options(
                client_type=CLIENT_TYPE_RING,
                id="e2e_test",
                addrs=[a.addr, b.addr],
            )
        )
        assert c.ping()
        keys = [f"key-{i}" for i in range(64)]
        for k in keys:
            assert c.set(k, "val")
        # every key lands on exactly one shard, reads route the same way
        for k in keys:
            assert c.get(k) == b"val"
            assert (k in a.store) != (k in b.store)
        # rendezvous hashing spreads load over both shards
        assert a.store and b.store
        c.close()
    finally:
        a.close()
        b.close()


def test_cluster_uses_slot_table(mini_cluster=None):
    s = MiniRedis(cluster_slots=True)
    try:
        c = new_client(
            Options(client_type=CLIENT_TYPE_CLUSTER, addrs=[s.addr])
        )
        assert c.ping()
        assert c.set("test_key", "test_value")
        assert c.get("test_key") == b"test_value"
        # the client actually asked for the topology
        assert any(
            call[0].upper() == "CLUSTER" for call in s.calls
        ), "cluster client never fetched CLUSTER SLOTS"
        c.close()
    finally:
        s.close()


def test_key_slot_hash_tags():
    # {tag} restricts hashing to the tag -> co-located keys
    assert key_slot("{user}:a") == key_slot("{user}:b")
    assert 0 <= key_slot("any-key") < 16384


def test_unknown_client_type_raises():
    with pytest.raises(ValueError):
        new_client(Options(client_type="bogus", addrs=["x:1"]))


def test_retries_then_connection_error():
    opts = Options(addrs=["127.0.0.1:1"], max_retries=1, read_timeout=0.05)
    c = new_client(opts)
    with pytest.raises(ConnectionError):
        c.ping()


def test_e2e_redis_clients_scenario():
    """Replays /root/reference/e2e/redis_clients/redis_clients.go:17-53:
    base, ring and cluster clients each ping and set test_key against
    live (local fake) servers."""
    servers = {
        "base": [MiniRedis()],
        "ring": [MiniRedis(), MiniRedis()],
        "cluster": [MiniRedis(cluster_slots=True)],
    }
    try:
        cases = [
            Options(client_type=CLIENT_TYPE_BASE,
                    addrs=[servers["base"][0].addr]),
            Options(client_type=CLIENT_TYPE_RING, id="e2e_test",
                    addrs=[s.addr for s in servers["ring"]]),
            Options(client_type=CLIENT_TYPE_CLUSTER,
                    addrs=[servers["cluster"][0].addr]),
        ]
        for opts in cases:
            client = new_client(opts)
            assert client.ping(), opts.client_type
            assert client.set("test_key", "test_value"), opts.client_type
            client.close()
        for kind, ss in servers.items():
            assert any(
                s.get("test_key") == "test_value" for s in ss
            ), f"{kind}: test_key not stored"
    finally:
        for ss in servers.values():
            for s in ss:
                s.close()


def test_cluster_follows_moved_redirect():
    """A node answering -MOVED (resharding) makes the cluster client
    retry at the new owner and refresh its slot table."""
    a = MiniRedis(cluster_slots=True)
    b = MiniRedis()
    try:
        c = new_client(
            Options(client_type=CLIENT_TYPE_CLUSTER, addrs=[a.addr])
        )
        assert c.set("warm", "1")  # populates the slot table from a
        a.moved_to = b.addr
        assert c.set("k", "v")
        assert b.get("k") == "v", "write did not follow the MOVED target"
        assert c.get("k") == b"v"
        c.close()
    finally:
        a.close()
        b.close()
