"""Golden TRAINING trajectory (SURVEY.md §4.2b — the local half of
loss-curve parity): loss1/2/3 over the first 50 tiny-config steps at a
fixed seed, on a fixed deterministic data stream, frozen as a fixture.

Guards optimizer/init/framing semantics across rounds: any change to
init distributions, Adam wiring, mu-law binning, or gradient topology
shows up here as a trajectory shift. When the Chainer reference mount
appears, its first-50-step trajectory slots into the same harness.

Regenerate (after a *deliberate* semantics change):
    python tests/test_golden_trajectory.py > tests/fixtures/golden_trajectory.json
    python tests/test_golden_trajectory.py chainer > tests/fixtures/golden_trajectory_chainer.json
    python tests/test_golden_trajectory.py ema > tests/fixtures/golden_trajectory_ema.json
(the __main__ block forces the same CPU/precision env as conftest).
Both mu-law binning modes carry a frozen trajectory, so the chainer
digitize-parity switch is turn-key end to end (SURVEY.md §7 hard-part 3).
"""

import dataclasses
import json
import os

import pytest

FIXTURES = {
    "round": os.path.join(os.path.dirname(__file__), "fixtures",
                          "golden_trajectory.json"),
    "chainer": os.path.join(os.path.dirname(__file__), "fixtures",
                            "golden_trajectory_chainer.json"),
    # the production-recommended VQ config (EMA codebook + dead-code
    # restart) gets its own frozen trajectory: guards the EMA update,
    # restart RNG wiring, and loss2-absence semantics across rounds
    "ema": os.path.join(os.path.dirname(__file__), "fixtures",
                        "golden_trajectory_ema.json"),
}
CHECK_STEPS = (1, 5, 10, 20, 30, 40, 50)


def run_trajectory(variant="round"):
    import jax
    import numpy as np
    from vqvae_tpu.audio.datasets import SineDataset
    from vqvae_tpu.configs import get_config
    from vqvae_tpu.parallel.mesh import batch_sharding, make_mesh
    from vqvae_tpu.train import create_train_state, make_train_step

    cfg = get_config("tiny")
    mkw = {"mulaw_mode": variant} if variant != "ema" else \
        {"ema": True, "code_restart_threshold": 1e-3}
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, batch_size=8),
        model=dataclasses.replace(cfg.model, **mkw))
    mesh = make_mesh()  # 8-device DP (DP-invariance is tested elsewhere)
    jit_for, shardings_of = make_train_step(cfg, mesh)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    sh = shardings_of(state)
    state = jax.device_put(state, sh)
    step_fn = jit_for(sh)

    ds = SineDataset(cfg.data)
    rng = np.random.default_rng(0)
    bsh = batch_sharding(mesh)
    out = {}
    for step in range(1, max(CHECK_STEPS) + 1):
        wavs, spks = zip(*[ds.sample(rng) for _ in range(8)])
        state, metrics = step_fn(
            state, jax.device_put(np.stack(wavs), bsh),
            jax.device_put(np.asarray(spks, np.int32), bsh))
        if step in CHECK_STEPS:
            out[str(step)] = {k: round(float(metrics[k]), 6)
                              for k in ("loss1", "loss2", "loss3")}
    return out


@pytest.mark.parametrize("mode", ["round", "chainer", "ema"])
def test_golden_training_trajectory(mode):
    import numpy as np
    with open(FIXTURES[mode]) as f:
        golden = json.load(f)
    got = run_trajectory(mode)
    for step, losses in golden.items():
        for k, v in losses.items():
            # tolerance loosens with step: f32 drift compounds through
            # Adam, but semantic changes move these by >> 1%
            tol = 1e-3 if int(step) <= 10 else 5e-3
            np.testing.assert_allclose(
                got[step][k], v, rtol=tol, atol=tol * abs(v) + 1e-5,
                err_msg=f"trajectory drifted at step {step} {k}")


if __name__ == "__main__":
    import sys
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    mode = sys.argv[1] if len(sys.argv) > 1 else "round"
    print(json.dumps(run_trajectory(mode), indent=1))
