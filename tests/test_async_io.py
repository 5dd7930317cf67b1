"""Async texture IO: background decode + one-per-frame amortized upload.

ref: ModelLoader.cs:1001-1108 async decode tasks + MainThreadQueue.cs lazy
drain (1 item/frame, pumped at Application.cs:140).
"""
import os
import time

import numpy as np
import pytest

from idkengine_tpu.scene.async_io import (
    AsyncTextureLoader, MainThreadQueue, attach_async_textures)

HELMET = "/root/reference/IDKEngine/Resource/Models/HelmetCompressed/Helmet.gltf"


def test_main_thread_queue_lazy_one_per_pump():
    q = MainThreadQueue()
    hits = []
    for i in range(3):
        q.add_lazy(lambda i=i: hits.append(("lazy", i)))
    q.add_hasty(lambda: hits.append(("hasty", 0)))
    q.pump()
    assert hits == [("hasty", 0), ("lazy", 0)]
    q.pump()
    q.pump()
    assert len(hits) == 4 and q.pending() == 0


def test_async_loader_runs_decode_off_thread():
    q = MainThreadQueue()
    ld = AsyncTextureLoader(q)
    seen = []
    ld.submit(lambda: 41 + 1, lambda r: seen.append(r))
    deadline = time.time() + 10
    while not seen and time.time() < deadline:
        q.pump()
        time.sleep(0.005)
    assert seen == [42]

    # decode failure: finisher is skipped, queue still drains
    ld.submit(lambda: 1 / 0, lambda r: seen.append(r))
    ld.wait_all()
    assert seen == [42] and ld.outstanding == 0


@pytest.mark.skipif(not os.path.exists(HELMET),
                    reason="reference helmet asset absent")
def test_deferred_textures_land_in_atlas():
    from idkengine_tpu.scene.gltf import load_gltf
    from idkengine_tpu.scene.scene_db import SceneDatabase

    m = load_gltf(HELMET, defer_textures=True)
    assert all(t.data is None for t in m.textures)
    assert any(t.source_bytes for t in m.textures)

    db = SceneDatabase()
    db.add_model(m)
    db.build()
    soa0 = db.materials.soa()
    assert (soa0["base_layer"] < 0).all()  # factors only at first

    q = MainThreadQueue()
    ld = AsyncTextureLoader(q)
    attach_async_textures(db, m, ld, mat_offset=0)
    ld.wait_all(timeout=120)
    soa1 = db.materials.soa()
    assert (soa1["base_layer"] >= 0).any()
    assert (soa1["normal_layer"] >= 0).any()
    # decoded content is image-like
    lay = int(soa1["base_layer"].max())
    arr = db.materials.atlas_layer(lay)
    assert arr.std() > 5
