"""Inference-server tests: endpoints, micro-batching, error paths."""

import concurrent.futures
import json
import urllib.request

import numpy as np
import pytest

from phyloformer_tpu.data import read_fasta
from phyloformer_tpu.infer.engine import InferenceConfig, InferenceEngine
from phyloformer_tpu.io import load_pretrained
from phyloformer_tpu.serve import InferenceServer

CKPT = "/root/reference/models/pf.ckpt"


@pytest.fixture(scope="module")
def server():
    params, cfg, _ = load_pretrained(CKPT)
    engine = InferenceEngine(params, cfg)
    srv = InferenceServer(engine, {"model": "pf"}, port=0, batch_window_ms=50)
    srv.start_background()
    yield srv
    srv.shutdown()


def _post(port, path, body, ctype="text/plain"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body,
        headers={"Content-Type": ctype}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=300) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as err:
        return err.code, err.read()


def test_healthz(server):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/healthz", timeout=30
    ) as resp:
        obj = json.loads(resp.read())
    assert obj["status"] == "ok" and obj["model"] == "pf"


def test_predict_matches_goldens(server, goldens_dir, testdata_dir):
    fasta = (testdata_dir / "msas" / "0_20_tips.fa").read_bytes()
    status, body = _post(server.port, "/predict", fasta)
    assert status == 200
    obj = json.loads(body)
    assert len(obj["ids"]) == 20
    dm = np.asarray(obj["distances"])
    g = np.load(goldens_dir / "pf_preds_testdata.npz")
    from phyloformer_tpu.data import square_to_vector

    np.testing.assert_allclose(square_to_vector(dm), g["0_20_tips"], atol=1e-3)


def test_predict_phylip_and_tree(server, testdata_dir):
    fasta = (testdata_dir / "msas" / "0_20_tips.fa").read_bytes()
    status, body = _post(server.port, "/predict?format=phylip", fasta)
    assert status == 200
    from phyloformer_tpu.data import read_phylip

    mat, ids = read_phylip(body)
    assert len(ids) == 20

    status, body = _post(server.port, "/predict?tree=nj", fasta)
    obj = json.loads(body)
    from phyloformer_tpu.data import parse_newick

    tree = parse_newick(obj["newick"])
    assert sorted(tree.leaf_names()) == sorted(obj["ids"])

    # tree=bme: full BME+NNI+SPR search server-side (native toolkit)
    status, body = _post(server.port, "/predict?tree=bme", fasta)
    assert status == 200
    obj = json.loads(body)
    tree = parse_newick(obj["newick"])
    assert sorted(tree.leaf_names()) == sorted(obj["ids"])


def test_json_body_and_microbatching(server, testdata_dir):
    """Concurrent requests coalesce into fewer engine batches."""
    fasta_text = (testdata_dir / "msas" / "1_20_tips.fa").read_text()
    payload = json.dumps({"fasta": fasta_text}).encode()
    batches_before = server.batcher.stats["batches"]

    def one(_):
        return _post(server.port, "/predict", payload, ctype="application/json")[0]

    with concurrent.futures.ThreadPoolExecutor(max_workers=6) as ex:
        codes = list(ex.map(one, range(6)))
    assert codes == [200] * 6
    batches_used = server.batcher.stats["batches"] - batches_before
    assert batches_used <= 4, f"micro-batching ineffective: {batches_used} batches"


def test_sharded_serving_matches_goldens(goldens_dir, testdata_dir):
    """pf-serve over a ('data','pair') mesh (ShardedInferenceEngine +
    pad_batch_sizes) returns the same distances as the single-device path —
    including the batch-size padding kept divisible by the data axis."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    from phyloformer_tpu.infer.engine import ShardedInferenceEngine
    from phyloformer_tpu.parallel import make_mesh

    params, cfg, _ = load_pretrained(CKPT)
    mesh = make_mesh(data=4, pair=2)
    engine = ShardedInferenceEngine(
        params, cfg, mesh, InferenceConfig(pad_batch_sizes=True)
    )
    srv = InferenceServer(engine, {"model": "pf"}, port=0, batch_window_ms=50)
    srv.start_background()
    try:
        fasta = (testdata_dir / "msas" / "0_20_tips.fa").read_bytes()
        status, body = _post(srv.port, "/predict", fasta)
        assert status == 200
        obj = json.loads(body)
        dm = np.asarray(obj["distances"])
        g = np.load(goldens_dir / "pf_preds_testdata.npz")
        from phyloformer_tpu.data import square_to_vector

        np.testing.assert_allclose(square_to_vector(dm), g["0_20_tips"], atol=1e-3)

        # a 3-request burst exercises the non-power-of-two padding path
        def one(_):
            return _post(srv.port, "/predict", fasta)[0]

        with concurrent.futures.ThreadPoolExecutor(max_workers=3) as ex:
            codes = list(ex.map(one, range(3)))
        assert codes == [200] * 3
    finally:
        srv.shutdown()


def test_sharded_padded_bsz():
    """Batch padding stays divisible by any (even non-power-of-two) data axis."""
    from phyloformer_tpu.infer.engine import ShardedInferenceEngine

    class Fake(ShardedInferenceEngine):
        def __init__(self, ndata):
            class M:  # minimal mesh stand-in
                shape = {"data": ndata}

            self.mesh = M()

    for ndata in (1, 2, 3, 4, 5, 8):
        eng = Fake(ndata)
        for n in range(1, 33):
            b = eng._padded_bsz(n)
            assert b >= n and b % ndata == 0


def test_bad_requests(server):
    status, body = _post(server.port, "/predict", b"not fasta at all")
    assert status == 400
    status, body = _post(server.port, "/nope", b"x")
    assert status == 404
