"""Frozen edit programs (pipelines/export.py): serialize -> reload -> run,
in-process and in a model-code-free subprocess."""
import os
import pickle
import subprocess
import sys

import jax
import numpy as np
import pytest

from pbe_tpu.pipelines.export import (
    export_edit_program,
    load_edit_program,
    load_edit_program_file,
    save_edit_program,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pipeline():
    from tests.test_serving import pipeline as fixture  # tiny 32² model

    return fixture.__wrapped__()


def _inputs(b):
    g = np.random.default_rng(0)
    image = g.uniform(-1, 1, (b, 32, 32, 3)).astype(np.float32)
    mask = np.ones((b, 32, 32, 1), np.float32)
    mask[:, 8:24, 8:24] = 0.0
    ref = g.standard_normal((b, 32, 32, 3)).astype(np.float32)
    x_T = g.standard_normal((b, 8, 8, 4)).astype(np.float32)  # f=4: 32->8
    return image, mask, ref, x_T


def test_export_reload_matches_pipeline(pipeline):
    image, mask, ref, x_T = _inputs(2)
    blob = export_edit_program(pipeline, batch=2, height=32, width=32,
                               steps=3, det_first_stage=True)
    assert isinstance(blob, bytes) and len(blob) > 1000

    want = pipeline.edit_batch(image, mask, ref, steps=3, scale=5.0,
                               seed=9, x_T=x_T, det_first_stage=True)
    fn = load_edit_program(blob)
    got = fn(pipeline.variables, image, mask, ref, x_T,
             np.float32(5.0), jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_exported_program_runs_without_model_code(pipeline, tmp_path):
    """A serving host needs only jax + the blob + the params — no flax
    model stack. Simulated by a subprocess that never imports pbe_tpu
    model/pipeline modules."""
    image, mask, ref, x_T = _inputs(1)
    blob = export_edit_program(pipeline, batch=1, height=32, width=32,
                               steps=2, det_first_stage=True)
    save_edit_program(str(tmp_path / "edit.stablehlo"), blob)
    with open(tmp_path / "params.pkl", "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, pipeline.variables), f)
    np.savez(tmp_path / "inputs.npz", image=image, mask=mask, ref=ref,
             x_T=x_T)
    want = pipeline.edit_batch(image, mask, ref, steps=2, scale=5.0,
                               seed=4, x_T=x_T, det_first_stage=True)
    np.save(tmp_path / "want.npy", want)

    code = f"""
import pickle, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {ROOT!r})
from pbe_tpu.export_runtime import load_edit_program_file
assert not any(m.startswith("pbe_tpu.models") or m.startswith("flax")
               for m in sys.modules), "model stack leaked into the loader"
fn = load_edit_program_file({str(tmp_path / "edit.stablehlo")!r})
with open({str(tmp_path / "params.pkl")!r}, "rb") as f:
    variables = pickle.load(f)
d = np.load({str(tmp_path / "inputs.npz")!r})
out = fn(variables, d["image"], d["mask"], d["ref"], d["x_T"],
         np.float32(5.0), jax.random.PRNGKey(4))
np.testing.assert_array_equal(np.asarray(out),
                              np.load({str(tmp_path / "want.npy")!r}))
print("SUBPROC-OK")
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "SUBPROC-OK" in r.stdout


def test_params_npz_round_trip(pipeline, tmp_path):
    from pbe_tpu.export_runtime import load_params_npz, save_params_npz

    path = str(tmp_path / "params.npz")
    save_params_npz(path, jax.tree.map(np.asarray, pipeline.variables))
    back = load_params_npz(path)
    jax.tree.map(np.testing.assert_array_equal, pipeline.variables, back)
    # structures must match exactly (same treedef), not just leaf values
    assert (jax.tree.structure(back)
            == jax.tree.structure(jax.tree.map(np.asarray,
                                               pipeline.variables)))


# -- compositions: export x int8 and export x shard --------------------------

from tests.test_quant import eligible_pipeline_pair  # noqa: F401,E402


def test_export_quantized_program_bakes_in_int8(eligible_pipeline_pair):
    """A quantize='int8' pipeline must freeze the QUANTIZED program (the
    export trace runs inside the quantized() context): reloaded output is
    bitwise-equal to the live int8 pipeline and differs from fp."""
    fp, q, S = eligible_pipeline_pair
    g = np.random.default_rng(3)
    image = g.uniform(-1, 1, (1, S, S, 3)).astype(np.float32)
    mask = np.ones((1, S, S, 1), np.float32)
    mask[:, 16:48, 16:48] = 0.0
    ref = g.standard_normal((1, 32, 32, 3)).astype(np.float32)
    x_T = g.standard_normal((1, 16, 16, 4)).astype(np.float32)

    blob = export_edit_program(q, batch=1, height=S, width=S, steps=2,
                               det_first_stage=True)
    fn = load_edit_program(blob)
    got = np.asarray(fn(q.variables, image, mask, ref, x_T,
                        np.float32(5.0), jax.random.PRNGKey(9)))
    want_q = q.edit_batch(image, mask, ref, steps=2, scale=5.0, seed=9,
                          x_T=x_T, det_first_stage=True)
    want_fp = fp.edit_batch(image, mask, ref, steps=2, scale=5.0, seed=9,
                            x_T=x_T, det_first_stage=True)
    np.testing.assert_array_equal(got, want_q)
    assert not np.array_equal(got, want_fp), \
        "exported program is the fp one — quantized context not applied"


def test_export_sharded_program_runs_on_the_mesh(pipeline):
    """pipeline.shard(mesh) exports a partitioned program: avals carry the
    batch/replicated shardings, the artifact runs on the 8-device CPU mesh
    and matches the live sharded pipeline bitwise."""
    from pbe_tpu.parallel import make_mesh
    from pbe_tpu.pipelines.inference import EditPipeline

    sharded = EditPipeline(pipeline.model, pipeline.variables)
    mesh = make_mesh()
    assert mesh.size == 8
    sharded.shard(mesh)

    b = 8
    image, mask, ref, x_T = _inputs(b)
    blob = export_edit_program(sharded, batch=b, height=32, width=32,
                               steps=2, det_first_stage=True)
    want = sharded.edit_batch(image, mask, ref, steps=2, scale=5.0, seed=9,
                              x_T=x_T, det_first_stage=True)
    fn = load_edit_program(blob)
    args = [jax.device_put(a.astype(pipeline.model.dtype),
                           sharded._batch_sharding)
            for a in (image, mask, ref, x_T)]
    got = np.asarray(fn(sharded.variables, *args,
                        np.float32(5.0), jax.random.PRNGKey(9)))
    np.testing.assert_array_equal(got, np.asarray(want))

    # mesh-size mismatch must fail loudly, not silently replicate
    with pytest.raises(ValueError, match="divisible"):
        export_edit_program(sharded, batch=3, height=32, width=32, steps=2)


def test_export_static_int8_bakes_constant_scales(eligible_pipeline_pair):
    """A quant_scales pipeline freezes the calibrated-constant-scale
    program: the reloaded artifact is bitwise-equal to the live static
    pipeline (the PTQ grid ships inside the StableHLO)."""
    from pbe_tpu.pipelines.inference import EditPipeline

    fp, q, S = eligible_pipeline_pair
    g = np.random.default_rng(6)
    image = g.uniform(-1, 1, (1, S, S, 3)).astype(np.float32)
    mask = np.ones((1, S, S, 1), np.float32)
    mask[:, 16:48, 16:48] = 0.0
    ref = g.standard_normal((1, 32, 32, 3)).astype(np.float32)
    x_T = g.standard_normal((1, 16, 16, 4)).astype(np.float32)

    scales = q.calibrate_int8(image, mask, ref, n_t=2)
    st = EditPipeline(q.model, q.variables, quantize="int8",
                      quant_scales=scales)
    blob = export_edit_program(st, batch=1, height=S, width=S, steps=2,
                               det_first_stage=True)
    fn = load_edit_program(blob)
    got = np.asarray(fn(st.variables, image, mask, ref, x_T,
                        np.float32(5.0), jax.random.PRNGKey(9)))
    want_st = st.edit_batch(image, mask, ref, steps=2, scale=5.0, seed=9,
                            x_T=x_T, det_first_stage=True)
    want_fp = fp.edit_batch(image, mask, ref, steps=2, scale=5.0, seed=9,
                            x_T=x_T, det_first_stage=True)
    np.testing.assert_array_equal(got, want_st)
    assert not np.array_equal(got, want_fp), \
        "exported program is the fp one — static context not applied"
