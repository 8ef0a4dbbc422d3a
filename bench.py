"""Benchmark: per-pipeline train + decode throughput on one chip.

Default (driver contract) benches the flagship speech BLSTM+CTC and
prints ONE JSON line; primary metric first:
  {"metric": "train_seqs_per_sec_per_chip", "value": N, "unit": "seq/s",
   "vs_baseline": N, "spread": {...}, "decode_seqs_per_sec_per_chip": N,
   "decode_spread": {...}, "pipeline": "speech"}

`--pipeline {speech,skeletal,rgb,early_fusion,late_fusion}` benches any
of the five reference pipelines with the same harness, so every
BASELINE.md throughput row is regenerable from this one committed
command (VERDICT r2 item 4). `--batch` overrides the per-pipeline
default (each default is the measured single-chip HBM cap).

Baseline derivation (BASELINE.md): the reference trains the full
3-stage system in ~100 h on a GTX 1060 at batch 2 over ~1900-frame
padded sequences — an implied train throughput of roughly 1.5
sequences/sec (SURVEY.md §6 "implied throughput floor"). vs_baseline is
measured seq/s divided by that 1.5 seq/s floor.

Methodology: the REAL train step at reference geometry — the full
preset model (e.g. BiLSTM(500)x2 over 1900 frames, 44-way CTC, Adam +
clip + maxnorm for speech) — on synthetic data, jitted once. REPEATS x
TIMED_STEPS steps with a scalar host fetch as the sync
(block_until_ready does not hard-sync through the relay); value
reported is the MEDIAN repeat, with the min/max spread so regressions
are distinguishable from relay jitter (VERDICT r1 item 10). The decode
benchmark times the fused predict+best-path step (make_decode_step, at
the pipeline's reference threshold) the same way.

Deadline contract (VERDICT r4 item 2): this script must print ONE
parseable JSON line within the caller's budget even when the relay is
wedged. Every successful measurement is cached to .bench_last_good.json;
when the relay cannot be reached (canary exhaustion, lock timeout, or a
mid-measurement backend failure) before MGR_TPU_BENCH_DEADLINE seconds
(default 2400) elapse, the cached line is re-emitted with
{"stale": true, "stale_reason": ...} and exit code 0 — a flagged
last-known-good number instead of a missing artifact. Cooldown sleeps
are sized to never overshoot the deadline.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_SEQS_PER_SEC = 1.5
WARMUP_STEPS = 2
TIMED_STEPS = 10
REPEATS = 3

# Relay-resilience knobs (VERDICT r3 item 2): the remote-attached chip
# can wedge for ~20-40 min under load; a canary + bounded cooldown-retry
# turns a transient wedge into a delayed measurement instead of rc=1.
# 210 s default: a recovering relay served a canary in >120 s but
# <240 s (measured round 5, 19:07-19:10Z) — 150 s declared it wedged
# and benched stale while a 240 s-gated campaign started fine.
CANARY_TIMEOUT_S = float(os.environ.get("MGR_TPU_BENCH_CANARY_TIMEOUT", "210"))
COOLDOWN_S = float(os.environ.get("MGR_TPU_BENCH_COOLDOWN", "1200"))
CANARY_RETRIES = int(os.environ.get("MGR_TPU_BENCH_RETRIES", "3"))
LOCK_WAIT_S = float(os.environ.get("MGR_TPU_BENCH_LOCK_WAIT", "3600"))

# Hard wall-clock budget for the WHOLE script (driver contract: one JSON
# line before the driver's timeout — BENCH_r04 was lost to rc=124 when
# canary cooldowns alone slept ~50 min). All waits are clipped so that
# at least MEASURE_MARGIN_S remains for the actual measurement; once the
# budget cannot fit a measurement, the cached last-good line is emitted.
DEADLINE_S = float(os.environ.get("MGR_TPU_BENCH_DEADLINE", "2400"))
MEASURE_MARGIN_S = 420.0
_START = time.monotonic()
LAST_GOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_last_good.json")


def _remaining() -> float:
    return DEADLINE_S - (time.monotonic() - _START)


def _save_last_good(payload: dict) -> None:
    try:
        tmp = LAST_GOOD_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, LAST_GOOD_PATH)
    except OSError:
        pass  # caching is best-effort; the live line already printed


def _emit_stale(reason: str) -> "SystemExit":
    """Print the cached last-good measurement flagged stale and exit 0.

    A perf artifact that can silently not exist is worse than a stale
    number (VERDICT r4): the driver always gets one parseable JSON line.
    """
    try:
        with open(LAST_GOOD_PATH) as f:
            payload = json.load(f)
    except (OSError, ValueError):
        payload = {
            "metric": "train_seqs_per_sec_per_chip",
            "value": 0.0,
            "unit": "seq/s",
            "vs_baseline": 0.0,
            "pipeline": "speech",
        }
    payload["stale"] = True
    payload["stale_reason"] = reason[:300]
    print(json.dumps(payload))
    return SystemExit(0)

_CANARY_SRC = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((256, 256));"
    "print(float((x @ x).sum()))"
)


def _await_relay() -> None:
    """Gate the heavy benchmark on chip health + exclusive ownership.

    1. Defer (bounded) while another campaign holds the chip lock —
       two concurrent TPU processes wedge the relay (CLAUDE.md).
    2. Canary: a fresh subprocess runs a tiny matmul + scalar fetch;
       a wedged relay hangs in backend init, so the subprocess can be
       killed on timeout and retried after a cooldown (the parent
       process could not abandon its own jax runtime this way).

    CPU-pinned runs (JAX_PLATFORMS=cpu, e.g. test smokes) skip both —
    the lock guards the relay, not the code."""
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return

    from mgr_tpu.core import campaign

    lock_wait = min(LOCK_WAIT_S, max(_remaining() - MEASURE_MARGIN_S, 0.0))
    if not campaign.wait_free(timeout_s=lock_wait):
        rec = campaign.holder()
        raise _emit_stale(
            f"chip lock still held after {lock_wait:.0f}s: {rec}")

    last = ""
    for attempt in range(CANARY_RETRIES):
        if _remaining() < MEASURE_MARGIN_S:
            raise _emit_stale(
                f"deadline ({DEADLINE_S:.0f}s) reached while gating: {last}")
        try:
            r = subprocess.run(
                [sys.executable, "-c", _CANARY_SRC],
                capture_output=True, text=True,
                timeout=min(CANARY_TIMEOUT_S,
                            max(_remaining() - MEASURE_MARGIN_S, 30.0)),
            )
            if r.returncode == 0:
                return
            last = r.stderr.strip()[-500:]
        except subprocess.TimeoutExpired:
            last = f"canary hung >{CANARY_TIMEOUT_S:.0f}s (wedged relay)"
        if attempt < CANARY_RETRIES - 1:
            # Sleep only as long as the deadline allows; a cooldown that
            # cannot leave room for a measurement is pointless.
            sleep_s = min(COOLDOWN_S, _remaining() - MEASURE_MARGIN_S
                          - CANARY_TIMEOUT_S)
            if sleep_s <= 0:
                raise _emit_stale(
                    f"deadline ({DEADLINE_S:.0f}s) reached while "
                    f"cooling down: {last}")
            print(
                f"bench: canary failed ({last}); cooling down "
                f"{sleep_s:.0f}s before retry "
                f"{attempt + 2}/{CANARY_RETRIES}",
                file=sys.stderr,
            )
            time.sleep(sleep_s)
    raise _emit_stale(
        f"relay unreachable after {CANARY_RETRIES} canary attempts: {last}")

# Per-pipeline defaults: single-chip HBM-cap batch (BASELINE.md) and the
# reference decode threshold (decode/decoder.py::DECODE_SPECS).
PIPELINES = {
    "speech": {"batch": 128, "threshold": 0.75},
    "skeletal": {"batch": 128, "threshold": 0.5},
    "rgb": {"batch": 16, "threshold": 0.0},
    "early_fusion": {"batch": 128, "threshold": 0.97},
    "late_fusion": {"batch": 64, "threshold": 0.5},
}


def _make_batch(cfg, B):
    rng = np.random.default_rng(0)
    T = cfg.maxlen

    def stream(F):
        return jnp.asarray(
            rng.standard_normal((B, T, F)).astype(np.float32)
        )

    if cfg.cnn is not None:
        d = cfg.cnn.img_dim
        inputs = jnp.asarray(
            rng.standard_normal((B, T, d, d, 1)).astype(np.float32)
        )
    else:
        inputs = stream(cfg.num_feats)
    batch = {
        "inputs": inputs,
        "labels": jnp.asarray(
            np.pad(
                rng.integers(1, cfg.nb_classes - 1, size=(B, 8)),
                ((0, 0), (0, cfg.max_label_len - 8)),
                constant_values=-1,
            ).astype(np.int32)
        ),
        "input_length": jnp.full((B,), T - cfg.ctc.trim_frames, jnp.int32),
        "label_length": jnp.full((B,), 8, jnp.int32),
    }
    if cfg.second_stream_feats:
        batch["inputs2"] = stream(cfg.second_stream_feats)
    return batch


def _bench_train(cfg, model, B):
    from mgr_tpu.core import prng
    from mgr_tpu.train import create_train_state, make_train_step

    state = create_train_state(model, prng.root_key(cfg.seed))
    step = make_train_step(model)
    batch = _make_batch(cfg, B)
    key = jax.random.key(0)

    for i in range(WARMUP_STEPS):
        state, metrics = step(state, batch, jax.random.fold_in(key, i), 1.0)
    float(metrics["loss"])  # scalar fetch: hard sync through the relay

    rates = []
    for r in range(REPEATS):
        t0 = time.perf_counter()
        for i in range(TIMED_STEPS):
            state, metrics = step(
                state, batch,
                jax.random.fold_in(key, 100 + r * TIMED_STEPS + i), 1.0,
            )
        float(metrics["loss"])  # hard sync
        rates.append(B * TIMED_STEPS / (time.perf_counter() - t0))
    return rates


def _bench_decode(cfg, model, params, B, threshold):
    from mgr_tpu.train.step import make_decode_step

    step = make_decode_step(model, threshold=threshold, trim_frames=2)
    batch = _make_batch(cfg, B)
    inputs = (
        (batch["inputs"], batch["inputs2"])
        if "inputs2" in batch
        else batch["inputs"]
    )
    lengths = jnp.full((B,), cfg.maxlen, jnp.int32)

    best, emit = step(params, inputs, lengths)
    int(best[0, 0])  # scalar fetch: hard sync

    rates = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(TIMED_STEPS):
            best, emit = step(params, inputs, lengths)
        int(best[0, 0])  # hard sync
        rates.append(B * TIMED_STEPS / (time.perf_counter() - t0))
    return rates


def _bench_latency(cfg, model, params, threshold, calls=20):
    """Single-utterance serving latency: B=1 fused predict+best-path,
    per-call wall-clock in ms (scalar fetch as the sync)."""
    from mgr_tpu.train.step import make_decode_step

    step = make_decode_step(model, threshold=threshold, trim_frames=2)
    batch = _make_batch(cfg, 1)
    inputs = (
        (batch["inputs"], batch["inputs2"])
        if "inputs2" in batch
        else batch["inputs"]
    )
    lengths = jnp.full((1,), cfg.maxlen, jnp.int32)

    best, _ = step(params, inputs, lengths)
    int(best[0, 0])  # compile + hard sync

    times = []
    for _ in range(calls):
        t0 = time.perf_counter()
        best, _ = step(params, inputs, lengths)
        int(best[0, 0])  # hard sync
        times.append((time.perf_counter() - t0) * 1000.0)
    return sorted(times)


def main() -> None:
    from mgr_tpu.core.platform import apply_env_platform

    # JAX_PLATFORMS must be authoritative even under site hooks that
    # re-pin the platform (mgr_tpu/core/platform.py) — a CPU smoke of
    # this script must never land on the relay-attached chip.
    apply_env_platform()

    # Chip runs only: defer to a live campaign, prove the relay answers
    # (canary + bounded cooldown-retry), then own the chip for the
    # duration of the measurement.
    _await_relay()
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        from mgr_tpu.core import campaign

        campaign.acquire("bench")
        import atexit

        atexit.register(campaign.release)

    from mgr_tpu.core import config as cfglib
    from mgr_tpu.core import prng
    from mgr_tpu.models import build_model
    from mgr_tpu.train import create_train_state

    ap = argparse.ArgumentParser()
    ap.add_argument("--pipeline", default="speech",
                    choices=sorted(PIPELINES))
    ap.add_argument("--batch", type=int, default=0,
                    help="override the pipeline's HBM-cap default")
    ap.add_argument("--no-cnn-remat", action="store_true",
                    help="rgb A/B: disable the conv-frontend remat")
    ap.add_argument("--latency", action="store_true",
                    help="serving mode: B=1 fused-decode latency in ms "
                         "(regenerates the BASELINE.md latency row)")
    ap.add_argument("--maxlen", type=int, default=0,
                    help="override sequence length (smoke testing)")
    args = ap.parse_args()
    spec = PIPELINES[args.pipeline]
    B = args.batch or spec["batch"]

    cfg = cfglib.get_preset(args.pipeline).replace(batch_size=B)
    if args.maxlen:
        cfg = cfg.replace(maxlen=args.maxlen)
    if args.no_cnn_remat and cfg.cnn is not None:
        import dataclasses

        cfg = cfg.replace(cnn=dataclasses.replace(cfg.cnn, remat=False))
    model = build_model(cfg)
    n_chips = max(len(jax.devices()), 1)

    try:
        if args.latency:
            params = create_train_state(
                model, prng.root_key(cfg.seed)).params
            times = _bench_latency(cfg, model, params, spec["threshold"])
            med = statistics.median(times)
            # Reference implied decode latency: ~2 seq/s on the GTX 1060
            # (BASELINE.md) -> ~500 ms/utterance.
            print(json.dumps({
                "metric": "decode_latency_ms",
                "value": round(med, 2),
                "unit": "ms",
                "vs_baseline": round(500.0 / med, 2),
                "spread": {"min": round(times[0], 2),
                           "max": round(times[-1], 2),
                           "calls": len(times)},
                "pipeline": args.pipeline,
                "batch": 1,
            }))
            return

        train_rates = sorted(
            r / n_chips for r in _bench_train(cfg, model, B))
        params = create_train_state(model, prng.root_key(cfg.seed)).params
        decode_rates = sorted(
            r / n_chips
            for r in _bench_decode(cfg, model, params, B, spec["threshold"])
        )
    except Exception as e:  # noqa: BLE001 — relay/backend failure mid-run
        if os.environ.get("JAX_PLATFORMS", "") == "cpu":
            raise  # CPU smokes must surface real bugs, not mask them
        raise _emit_stale(
            f"measurement failed: {type(e).__name__}: {e}") from None

    value = statistics.median(train_rates)
    dec_value = statistics.median(decode_rates)
    payload = {
        "metric": "train_seqs_per_sec_per_chip",
        "value": round(value, 3),
        "unit": "seq/s",
        "vs_baseline": round(value / REFERENCE_SEQS_PER_SEC, 2),
        "spread": {
            "min": round(train_rates[0], 3),
            "max": round(train_rates[-1], 3),
            "repeats": REPEATS,
        },
        "decode_seqs_per_sec_per_chip": round(dec_value, 3),
        "decode_spread": {
            "min": round(decode_rates[0], 3),
            "max": round(decode_rates[-1], 3),
        },
        "pipeline": args.pipeline,
        "batch": B,
    }
    # Cache only the driver-contract configuration (default pipeline on
    # the real chip) — a stale fallback must represent the same metric.
    if (args.pipeline == "speech" and not args.batch and not args.maxlen
            and os.environ.get("JAX_PLATFORMS", "") != "cpu"):
        _save_last_good(payload)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
