"""Live URL-fetch data path, exercised offline against an in-process HTTP
server (round-3 VERDICT missing #2/#3): `fetch_single_image` success / 404 /
junk-bytes / timeout / retry semantics, `MinimagenDataset.__getitem__`
filtering (reference training.py:129-142, 214-269), the HF
`ConceptualCaptions` branch via a stub `datasets` module (training.py:272-313),
and dataset -> collator -> one real train step end-to-end.
"""
import io
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from types import SimpleNamespace

import numpy as np
import pytest

from minimagen_tpu.data.collate import DataLoader, MinimagenCollator
from minimagen_tpu.data.dataset import (
    ConceptualCaptions,
    MinimagenDataset,
    fetch_single_image,
)


def _png_bytes(h=20, w=24, mode="RGB", seed=0):
    import PIL.Image

    rng = np.random.default_rng(seed)
    if mode == "RGB":
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    elif mode == "RGBA":
        arr = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    else:  # "L"
        arr = rng.integers(0, 256, (h, w), dtype=np.uint8)
    buf = io.BytesIO()
    PIL.Image.fromarray(arr, mode=mode).save(buf, format="PNG")
    return buf.getvalue()


class _Handler(BaseHTTPRequestHandler):
    flaky_hits = {}

    def log_message(self, *a):  # keep pytest output clean
        pass

    def do_GET(self):
        if self.path.startswith("/img"):
            seed = int(self.path.rsplit("_", 1)[-1].split(".")[0])
            body = _png_bytes(seed=seed)
        elif self.path == "/gray.png":
            body = _png_bytes(mode="L")
        elif self.path == "/rgba.png":
            body = _png_bytes(mode="RGBA")
        elif self.path == "/junk.bin":
            body = b"this is not an image at all" * 10
        elif self.path == "/hang":
            time.sleep(3.0)
            body = _png_bytes()
        elif self.path == "/flaky.png":
            n = _Handler.flaky_hits["n"] = _Handler.flaky_hits.get("n", 0) + 1
            if n == 1:
                self.send_error(500, "first hit fails")
                return
            body = _png_bytes()
        else:
            self.send_error(404, "no such image")
            return
        self.send_response(200)
        self.send_header("Content-Type", "image/png")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def http_base():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    server.server_close()


def test_fetch_single_image_paths(http_base):
    img = fetch_single_image(f"{http_base}/img_3.png", timeout=5.0)
    assert img is not None and img.size == (24, 20)

    assert fetch_single_image(f"{http_base}/missing.png", timeout=5.0) is None
    assert fetch_single_image(f"{http_base}/junk.bin", timeout=5.0) is None
    # hung server: urlopen times out -> None (reference timeout kwarg,
    # training.py:133-138)
    t0 = time.monotonic()
    assert fetch_single_image(f"{http_base}/hang", timeout=0.4) is None
    assert time.monotonic() - t0 < 2.5


def test_fetch_single_image_retries(http_base):
    _Handler.flaky_hits.clear()
    assert fetch_single_image(f"{http_base}/flaky.png", timeout=5.0, retries=0) is None
    _Handler.flaky_hits.clear()
    img = fetch_single_image(f"{http_base}/flaky.png", timeout=5.0, retries=1)
    assert img is not None


def _hf_dict(http_base, train_urls, train_caps, valid_urls=(), valid_caps=()):
    return {
        "train": {"image_url": [f"{http_base}{u}" for u in train_urls],
                  "caption": list(train_caps)},
        "validation": {"image_url": [f"{http_base}{u}" for u in valid_urls],
                       "caption": list(valid_caps)},
    }


def test_minimagen_dataset_filters_and_items(http_base):
    """Good URLs yield items; 404 / junk / grayscale / RGBA yield None
    (reference rejects non-3-channel AFTER the transform, training.py:264)."""
    dset = _hf_dict(
        http_base,
        ["/img_0.png", "/missing.png", "/junk.bin", "/gray.png", "/rgba.png", "/img_1.png"],
        ["a", "b", "c", "d", "e", "f"],
    )
    ds = MinimagenDataset(dset, encoder_name="t5_small", max_length=8,
                          side_length=8, train=True, fetch_timeout=5.0)
    assert len(ds) == 6
    item = ds[0]
    assert item is not None
    assert item["image"].shape == (8, 8, 3)
    assert item["image"].dtype == np.float32
    assert abs(item["image"].min()) < 1e-6 and abs(item["image"].max() - 1) < 1e-6
    assert ds[1] is None      # 404
    assert ds[2] is None      # not an image
    assert ds[3] is None      # grayscale -> 1 channel -> rejected
    assert ds[4] is None      # RGBA -> 4 channels -> rejected
    assert ds[5] is not None


def test_live_dataset_to_train_step(http_base):
    """The reference's primary modality end-to-end: URL fetch -> resize ->
    collate -> one real train step (loss finite, params update)."""
    import jax

    from minimagen_tpu.models.imagen import Imagen
    from minimagen_tpu.models.unet import BaseTest
    from minimagen_tpu.parallel.mesh import (
        create_train_state, make_optimizer, make_train_step,
    )

    urls = [f"/img_{i}.png" for i in range(4)] + ["/missing.png"]
    caps = [f"caption number {i}" for i in range(5)]
    ds = MinimagenDataset(_hf_dict(http_base, urls, caps),
                          encoder_name="t5_small", max_length=8,
                          side_length=8, train=True, fetch_timeout=5.0)
    dl = DataLoader(ds, batch_size=5, shuffle=False, drop_last=False,
                    collate_fn=MinimagenCollator(max_length=8))
    batch = next(iter(dl))
    assert batch["image"].shape == (4, 8, 8, 3)  # the 404 row was dropped

    imagen = Imagen(unets=[BaseTest()], image_sizes=(8,), timesteps=25,
                    cond_drop_prob=0.1, text_encoder_name="t5_small")
    imagen.init_params(jax.random.PRNGKey(0), batch_size=2, text_len=8)
    opt = make_optimizer(1e-4)
    state = create_train_state(imagen.params, opt)
    step = make_train_step(imagen, opt, mesh=None, donate=False)
    state2, losses = step(state, batch, jax.random.PRNGKey(1))
    assert np.all(np.isfinite(np.asarray(losses)))
    l1 = jax.tree_util.tree_leaves(state.params)[0]
    l2 = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(l1), np.asarray(l2))


# --------------------------------------------------------------------------- #
# ConceptualCaptions HF branch via a stub `datasets` module                    #
# --------------------------------------------------------------------------- #
def _cc_args(**over):
    base = dict(MAX_NUM_WORDS=8, T5_NAME="t5_small", IMG_SIDE_LEN=8,
                TRAIN_VALID_FRAC=0.75, VALID_NUM=None)
    base.update(over)
    return SimpleNamespace(**base)


def _fake_cc(n_train=40, n_valid=10):
    return {
        "train": {"image_url": [f"http://x/{i}.png" for i in range(n_train)],
                  "caption": [f"t{i}" for i in range(n_train)]},
        "validation": {"image_url": [f"http://v/{i}.png" for i in range(n_valid)],
                       "caption": [f"v{i}" for i in range(n_valid)]},
    }


@pytest.fixture()
def stub_datasets(monkeypatch):
    """Install a `datasets` stub whose load_dataset returns a fake CC dict
    (reference training.py:272-313 semantics, pinned without network)."""
    import sys
    import types

    mod = types.ModuleType("datasets")
    mod.load_dataset = lambda name: _fake_cc()
    monkeypatch.setitem(sys.modules, "datasets", mod)
    return mod


def test_conceptual_captions_smalldata_slices_16(stub_datasets):
    train_ds, valid_ds = ConceptualCaptions(_cc_args(), smalldata=True)
    # smalldata truncates BOTH splits to 16 BEFORE the frac split
    # (reference training.py:286-295)
    total = len(train_ds) + len(valid_ds)
    assert total == 16
    assert len(train_ds) == int(0.75 * 16)
    base = train_ds.base
    assert isinstance(base, MinimagenDataset)
    assert len(base.urls) == 16


def test_conceptual_captions_split_and_valid_num(stub_datasets):
    args = _cc_args(TRAIN_VALID_FRAC=0.5, VALID_NUM=3)
    train_ds, valid_ds = ConceptualCaptions(args)
    assert len(train_ds) == 20
    # VALID_NUM truncation keeps VALID_NUM+1 items (reference training.py:308)
    assert len(valid_ds) == 4
    # split is a disjoint cover of the train split's indices
    assert set(train_ds.indices).isdisjoint(valid_ds.indices)


def test_conceptual_captions_testset_returns_validation(stub_datasets):
    test_ds = ConceptualCaptions(_cc_args(), testset=True)
    assert isinstance(test_ds, MinimagenDataset)
    assert len(test_ds) == 10  # validation split
    assert test_ds.urls[0].startswith("http://v/")


def test_conceptual_captions_falls_back_offline(monkeypatch):
    """Without a working `datasets`, the factory warns and serves the
    synthetic offline dataset (documented deviation)."""
    import sys
    import types

    mod = types.ModuleType("datasets")

    def _boom(name):
        raise RuntimeError("offline")

    mod.load_dataset = _boom
    monkeypatch.setitem(sys.modules, "datasets", mod)
    with pytest.warns(UserWarning, match="offline synthetic"):
        train_ds, valid_ds = ConceptualCaptions(_cc_args(), smalldata=True)
    assert len(train_ds) + len(valid_ds) == 16
