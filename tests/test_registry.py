"""Etcd registry tests against an in-process fake etcd v3 JSON gateway
(the reference's registry tests need a live localhost etcd and 15 s lease
sleeps — SURVEY.md §4; ours fake the gateway)."""

import asyncio
import base64
import json

import pytest
from aiohttp import web

from speaksense_tpu.registry.etcd import MICRO_PREFIX, EtcdRegistry


class FakeEtcd:
    def __init__(self):
        self.kv: dict[str, tuple[str, int]] = {}
        self.leases: dict[int, int] = {}  # id -> ttl
        self.keepalives: list[int] = []
        self._next_lease = 100

    def app(self) -> web.Application:
        app = web.Application()
        app.router.add_post("/v3/lease/grant", self.lease_grant)
        app.router.add_post("/v3/lease/revoke", self.lease_revoke)
        app.router.add_post("/v3/lease/keepalive", self.keepalive)
        app.router.add_post("/v3/kv/put", self.kv_put)
        app.router.add_post("/v3/kv/deleterange", self.kv_delete)
        return app

    async def lease_grant(self, req):
        body = await req.json()
        lease_id = self._next_lease
        self._next_lease += 1
        self.leases[lease_id] = int(body["TTL"])
        return web.json_response({"ID": str(lease_id), "TTL": body["TTL"]})

    async def lease_revoke(self, req):
        body = await req.json()
        self.leases.pop(int(body["ID"]), None)
        return web.json_response({})

    async def keepalive(self, req):
        body = await req.json()
        lid = int(body["ID"])
        self.keepalives.append(lid)
        if lid in self.leases:  # live lease: etcd reports remaining TTL
            return web.json_response(
                {"result": {"ID": body["ID"], "TTL": str(self.leases[lid])}})
        # expired/unknown lease: result carries no TTL (etcd semantics)
        return web.json_response({"result": {"ID": body["ID"]}})

    async def kv_put(self, req):
        body = await req.json()
        key = base64.b64decode(body["key"]).decode()
        value = base64.b64decode(body["value"]).decode()
        self.kv[key] = (value, int(body.get("lease", 0)))
        return web.json_response({})

    async def kv_delete(self, req):
        body = await req.json()
        key = base64.b64decode(body["key"]).decode()
        self.kv.pop(key, None)
        return web.json_response({"deleted": "1"})


def _service_info(name="asr", node_id="asr-node-1"):
    return {"name": name, "version": "latest", "metadata": {}, "endpoints": [],
            "nodes": [{"id": node_id, "address": "1.2.3.4:7300", "metadata": {}}]}


async def _with_fake_etcd(fn):
    fake = FakeEtcd()
    runner = web.AppRunner(fake.app())
    await runner.setup()
    site = web.TCPSite(runner, "127.0.0.1", 0)
    await site.start()
    port = site._server.sockets[0].getsockname()[1]
    try:
        return await fn(fake, f"http://127.0.0.1:{port}")
    finally:
        await runner.cleanup()


def test_register_writes_go_micro_key():
    async def flow(fake, endpoint):
        reg = EtcdRegistry(endpoint, lease_ttl=10)
        await reg.register(_service_info())
        key = f"{MICRO_PREFIX}/asr/asr-node-1"
        assert key in fake.kv
        value, lease = fake.kv[key]
        assert lease == reg.lease_id and lease in fake.leases
        payload = json.loads(value)
        assert payload["nodes"][0]["address"] == "1.2.3.4:7300"
        await reg.deregister()
        assert key not in fake.kv
        assert reg.lease_id is None and not fake.leases
        return True

    assert asyncio.run(_with_fake_etcd(flow))


def test_heartbeat_sends_keepalives():
    async def flow(fake, endpoint):
        reg = EtcdRegistry(endpoint, lease_ttl=10, heartbeat_interval=0.05)
        await reg.register(_service_info())
        await reg.start_heartbeat()
        await asyncio.sleep(0.3)
        await reg.stop_heartbeat()
        assert len(fake.keepalives) >= 2
        assert all(k == reg.lease_id for k in fake.keepalives)
        await reg.deregister()
        return True

    assert asyncio.run(_with_fake_etcd(flow))


def test_register_unreachable_raises():
    async def flow():
        reg = EtcdRegistry("http://127.0.0.1:1", timeout=0.3)
        with pytest.raises(Exception):
            await reg.register(_service_info())

    asyncio.run(flow())


def test_reregisters_after_lease_expiry():
    """An etcd outage longer than the TTL kills the lease; the heartbeat must
    detect the dead lease (keepalive reports no TTL) and re-register with a
    fresh one instead of logging failures forever (VERDICT r1 item 10)."""
    async def flow(fake, endpoint):
        reg = EtcdRegistry(endpoint, lease_ttl=10, heartbeat_interval=0.05)
        await reg.register(_service_info())
        old_lease = reg.lease_id
        key = reg.key
        # simulate lease expiry server-side: lease gone, key swept
        del fake.leases[old_lease]
        fake.kv.pop(key, None)
        await reg.start_heartbeat()
        deadline = asyncio.get_event_loop().time() + 5.0
        while reg.reregistrations == 0:
            assert asyncio.get_event_loop().time() < deadline, "no re-register"
            await asyncio.sleep(0.05)
        await reg.stop_heartbeat()
        assert reg.lease_id != old_lease
        assert key in fake.kv            # key re-written
        assert fake.kv[key][1] == reg.lease_id  # under the NEW lease
        await reg.deregister()

    asyncio.run(_with_fake_etcd(flow))
