#!/usr/bin/env python
"""Benchmark: canonical T1->T2 GAN train throughput on one TPU chip.

Measures the full alternating GAN train step (6-block CasNet generator +
global discriminator, 128^3 volumes, bf16 compute — the canonical
GAN_final.py configuration) and prints JSON result lines:
  {"metric": "train_slices_per_sec_per_chip", "value": N,
   "unit": "slices/s/chip", "vs_baseline": N, ...detail fields}

"slices/sec" counts 128 axial slices per volume (the BASELINE.json
north-star unit). The reference publishes no throughput numbers
(BASELINE.md: "No throughput numbers are published anywhere"), so
vs_baseline is reported against THIS framework's round-1 measurement
(196.33 slices/s/chip, BENCH_r01.json) — our own recorded baseline.

UN-LOSABLE CONTRACT (round-3 redesign — round 2's artifact was lost to a
mid-round tunnel death that the old single-process bench retried into a
driver timeout, BENCH_r02.json rc=124 parsed:null):

  * The process that owns stdout (the parent) imports NOTHING that can
    hang. The measurement runs in a CHILD process; the parent enforces a
    wall-clock budget (env BENCH_BUDGET_S, default 1080 s — well under
    the driver's ~25 min timeout) and kills the child by pid when it is
    exceeded.
  * INCREMENTAL emission: a complete, parseable result line is printed
    the moment the strict phase is measured; the fast phase then emits an
    upgraded line. Consumers take the LAST parseable line.
  * Error CLASSIFICATION in the child: backend-init / UNAVAILABLE /
    connection errors abort immediately (no smaller batch can fix a dead
    tunnel); only RESOURCE_EXHAUSTED-class and over-HBM compile failures
    walk the (batch, accum) fallback chain.
  * On total failure the parent still prints a parseable line:
    {"metric": ..., "value": null, "error": ..., "last_known": {...}}
    where last_known carries the most recent builder-measured numbers
    (BENCH_NOTES.md) clearly marked as NOT measured by this run.

Each run measures BOTH step semantics and reports them side by side:
  * "strict" — exact GAN_final.py:289-291 reference semantics (the D
    sub-step re-runs G with the just-updated params; two scans). The
    top-level value/vs_baseline are defined on THIS number so the
    official artifact always carries the parity-semantics figure.
  * "fast"  — the framework's documented fast mode (reuse_g_forward +
    fused joint-loss step; identical loss trajectory, BN running-stat
    EMA order deviation documented in BENCH_NOTES.md round-4).
Set BENCH_SEMANTICS=strict|fast|both (default both) to restrict.

Speed-of-light accounting: `flops_per_step` is the ANALYTIC per-layer
count (utils/flops.py — XLA's cost model counts lax.scan bodies once, not
x length x accum, undercounting the scanned CasNet ~1.5x; the raw XLA
number is kept as `flops_per_step_xla`); `achieved_tflops` = flops/time
and `mfu` divides by the chip's peak for the compute dtype (v5e: 197 bf16
TFLOP/s). The `sol` block carries the speed-of-light statement: the MFU
is architecture-bound, not a scheduling gap — see BENCH_NOTES.md
"Speed of light" section for the measured argument.

Env knobs: BENCH_BUDGET_S (default 1080), BENCH_BATCH (default 4,
auto-falls back on OOM), BENCH_STEPS (default 10), BENCH_SPATIAL
(default 128), BENCH_MODE (gan|generator_only|patch, default gan),
BENCH_REUSE_G=1, BENCH_FUSED=1, BENCH_ACCUM, BENCH_SEMANTICS.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

# Round-1 driver-recorded baseline (BENCH_r01.json). The reference itself
# publishes no throughput number to compare against.
R1_BASELINE = 196.33

# Most recent builder-measured numbers (BENCH_NOTES.md round-5, same-session
# A/B on the v5e chip). Emitted ONLY inside "last_known" on total failure,
# explicitly marked as not measured by the failing run.
LAST_KNOWN = {
    "source": "BENCH_NOTES.md round-5 (builder-measured, NOT this run)",
    "strict_slices_per_s_per_chip": 232.1,
    "strict_train_ms_per_step": 2205.8,
    "fast_slices_per_s_per_chip": 269.7,
    "fast_train_ms_per_step": 1898.5,
}

FATAL_MARKERS = (
    "unable to initialize backend",
    "unavailable",
    "failed to connect",
    "connection refused",
    "deadline_exceeded",
    "socket closed",
    "backend setup/compile error (unavailable)",
)
OOM_MARKERS = ("resource_exhausted", "out of memory", "exceeds the limit")


class BenchFatal(RuntimeError):
    """Backend-level failure that no (batch, accum) fallback can fix."""


def classify(exc: Exception) -> str:
    msg = str(exc).lower()
    if any(m in msg for m in FATAL_MARKERS):
        return "fatal"
    if any(m in msg for m in OOM_MARKERS):
        return "oom"
    # e.g. remote-compile INTERNAL errors: without explicit remat, an
    # over-HBM accum=1 step fails in the compiler instead of raising a
    # clean OOM — treat unknown as retryable, but the chain is short and
    # the parent budget bounds the total.
    return "retry"


# --------------------------------------------------------------------------
# Child: the actual measurement (may hang/die — the parent guards it)
# --------------------------------------------------------------------------

def child_main() -> None:
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1080"))
    t_start = time.time()

    def remaining() -> float:
        return budget_s - (time.time() - t_start)

    import jax

    # BENCH_PLATFORM=cpu forces the platform through jax.config (this
    # container's sitecustomize registers the axon TPU plugin in every
    # interpreter, so the JAX_PLATFORMS env var alone is not honored).
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir",
                      str(Path.home() / ".cache" / "jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from minipig_gan_tpu.config import Config, TrainConfig
    from minipig_gan_tpu.train import GANTrainer

    print(f"# backend: {jax.devices()}", file=sys.stderr, flush=True)

    if os.environ.get("BENCH_CI1_DOT", "1") == "0":  # A/B hook
        from minipig_gan_tpu.ops import fastconv

        fastconv.set_ci1_dot_all(False)
    if os.environ.get("BENCH_D_TAP", "0") == "1":  # A/B hook
        from minipig_gan_tpu.ops import fastconv

        fastconv.set_d_tap_wgrad(True)
    if os.environ.get("BENCH_CI1_TAPS_MAJOR", "0") == "1":  # A/B hook
        from minipig_gan_tpu.ops import fastconv

        fastconv.set_ci1_taps_major(True)
    if os.environ.get("BENCH_CI1_PALLAS", "0") == "1":  # A/B hook
        from minipig_gan_tpu.ops import fastconv

        fastconv.set_ci1_pallas(True)

    spatial = int(os.environ.get("BENCH_SPATIAL", "128"))
    n_steps = int(os.environ.get("BENCH_STEPS", "10"))
    mode = os.environ.get("BENCH_MODE", "gan")
    b0 = int(os.environ.get("BENCH_BATCH", "4"))
    # accum 2 is the canonical fit: batch 4 accum 1 exceeds HBM at 128^3
    # whether or not remat is on (33.8 GB with explicit remat; compile
    # failure without — BENCH_NOTES.md), so don't burn ~100s compiling it.
    a0 = int(os.environ.get("BENCH_ACCUM", "2"))
    # (batch, accum) fallback chain: keep the reference batch size via
    # gradient accumulation before shrinking the batch itself
    candidates = [(b0, a0), (4, 2), (4, 4), (2, 1), (2, 2), (1, 1)]

    rs = np.random.RandomState(0)

    def make_batch(b):
        t1 = np.tanh(rs.randn(b, spatial, spatial, spatial, 1)).astype(np.float32)
        t2 = np.clip(0.8 * t1 + 0.1, -1, 1).astype(np.float32)
        return {"t1w": jnp.asarray(t1), "t2w": jnp.asarray(t2)}

    def measure(reuse_g: bool, fused: bool, measure_inference: bool):
        """One (batch, accum)-fallback measurement of the train step under
        the given semantics. Returns the detail dict or raises."""
        last_err: Exception | None = None
        for batch_size, accum in dict.fromkeys(candidates):
            if remaining() < 120:
                raise BenchFatal(
                    f"budget exhausted mid-fallback (last error: {last_err})")
            try:
                cfg = Config(train=TrainConfig(mode=mode,
                                               compute_dtype="bfloat16",
                                               batch_size=batch_size,
                                               accum_steps=accum,
                                               reuse_g_forward=reuse_g,
                                               fused_step=fused))
                tr = GANTrainer(cfg)
                batch = make_batch(batch_size)
                t_init0 = time.time()
                state = tr.init_jit(jax.random.PRNGKey(0), batch)
                jax.block_until_ready(jax.tree.leaves(state.g_params)[0])
                init_s = time.time() - t_init0

                t_c0 = time.time()
                step = jax.jit(tr.train_step, donate_argnums=0)
                compiled = step.lower(state, batch).compile()
                compile_s = time.time() - t_c0
                # speed-of-light accounting from XLA's own cost model
                flops_per_step = 0.0
                try:
                    cost = compiled.cost_analysis()
                    if isinstance(cost, (list, tuple)):
                        cost = cost[0]
                    flops_per_step = float(cost.get("flops", 0.0) or 0.0)
                except Exception as ce:  # cost model unavailable on some backends
                    print(f"# cost_analysis unavailable: {ce!r}", file=sys.stderr)
                # XLA's cost model counts scan bodies ONCE (not x length x
                # accum), undercounting the 6-block CasNet scan — use the
                # analytic per-layer count as the MFU numerator and keep the
                # XLA number for reference.
                from minipig_gan_tpu.utils.flops import gan_step_flops

                analytic_flops = gan_step_flops(cfg, batch_size,
                                                (spatial,) * 3)
                step = compiled
                # NOTE: on tunneled/async backends block_until_ready can return
                # before remote execution completes; a scalar device_get
                # (float()) is the only reliable sync. Per-step time is
                # measured DIFFERENTIALLY — ((time of 2N steps+fetch) -
                # (N steps+fetch))/N — so constant fetch/queue overhead
                # cancels.
                state, metrics = step(state, batch)
                float(metrics["g_loss"])

                def timed_steps(state, n):
                    t0 = time.time()
                    for _ in range(n):
                        state, metrics = step(state, batch)
                    g = float(metrics["g_loss"])
                    return state, time.time() - t0, g

                state, t_n, _ = timed_steps(state, n_steps)
                state, t_2n, g_val = timed_steps(state, 2 * n_steps)
                dt = max((t_2n - t_n) / n_steps, 1e-9)

                inf_dt = None
                if measure_inference:
                    # Inference throughput: the BN-folded serving forward
                    # (models/fold.py, +25% over stats-threading).
                    # Two relay hazards (tpu_tests/hbm_peak.py docstring):
                    # executions are MEMOIZED by (executable, args), and
                    # block_until_ready does not synchronize — so (a) the
                    # chain is continuous across BOTH timed segments
                    # (restarting from x0 would replay already-memoized
                    # pairs: that produced the bogus 317 vols/s in
                    # BENCH_r03.json), and (b) each segment syncs via a
                    # scalar host fetch, the one operation that provably
                    # waits here.
                    gen = tr.make_fast_generator(state)
                    x0 = batch["t1w"]
                    out = gen(x0)
                    float(out[0, 0, 0, 0, 0])  # warm-up + compile sync

                    def timed_inf(out, n):
                        t0 = time.time()
                        for _ in range(n):
                            out = gen(out.astype(x0.dtype))
                        float(out[0, 0, 0, 0, 0])  # host-fetch sync
                        return out, time.time() - t0

                    out, i_n = timed_inf(out, n_steps)
                    out, i_2n = timed_inf(out, 2 * n_steps)
                    inf_dt = max((i_2n - i_n) / n_steps, 1e-9)

                value = round(batch_size * spatial / dt, 2)
                # v5e peak: 197 bf16 TFLOP/s per chip
                peak_tflops = 197.0 if "v5" in str(jax.devices()[0]) else 0.0
                achieved_tflops = analytic_flops / dt / 1e12
                detail = {
                    "slices_per_s_per_chip": value,
                    "flops_per_step": analytic_flops,
                    "flops_per_step_xla": flops_per_step,
                    "achieved_tflops": round(achieved_tflops, 2),
                    "mfu": (round(achieved_tflops / peak_tflops, 4)
                            if peak_tflops and analytic_flops else None),
                    "train_ms_per_step": round(dt * 1e3, 1),
                    "train_vols_per_s": round(batch_size / dt, 3),
                    "batch_size": batch_size,
                    "accum_steps": accum,
                    "reuse_g_forward": reuse_g,
                    "fused_step": fused,
                    "compile_s": round(compile_s, 1),
                    "init_s": round(init_s, 1),
                    "g_loss": g_val,
                }
                if peak_tflops and analytic_flops:
                    detail["mxu_floor_ms"] = round(
                        analytic_flops / (peak_tflops * 1e12) * 1e3, 1)
                if inf_dt is not None:
                    detail["infer_vols_per_s"] = round(batch_size / inf_dt, 3)
                    detail["infer_ms_per_batch"] = round(inf_dt * 1e3, 1)
                    detail["infer_path"] = (
                        "bn_folded_serving (make_fast_generator); train-step"
                        " semantics do not affect this path")
                return detail
            except BenchFatal:
                raise
            except Exception as e:
                kind = classify(e)
                if kind == "fatal":
                    # a dead backend/tunnel: no smaller batch can fix it —
                    # abort the whole bench NOW (round-2 lesson: the old
                    # retry-smaller walk burned the driver timeout)
                    raise BenchFatal(str(e).splitlines()[0][:300]) from e
                last_err = e
                print(f"# batch {batch_size} accum {accum} {kind} "
                      f"({str(e).splitlines()[0][:120]}), retrying smaller",
                      file=sys.stderr, flush=True)
                continue
        raise BenchFatal(f"all candidates failed: {last_err}")

    semantics = os.environ.get("BENCH_SEMANTICS", "both")
    if semantics not in ("strict", "fast", "both"):
        raise SystemExit(
            f"unknown BENCH_SEMANTICS={semantics!r} (use strict|fast|both)")
    # Fast mode: reuse_g_forward (+7%) and, for gan mode, the fused
    # joint-loss step (+3.8% more; patch mode measured NEUTRAL fused —
    # BENCH_NOTES round-4 — so fast==strict-step-shape there except reuse_g).
    fast_reuse = os.environ.get("BENCH_REUSE_G", "1") == "1"
    fast_fused = (fast_reuse and os.environ.get(
        "BENCH_FUSED", "1" if mode == "gan" else "0") == "1")

    def emit(strict, fast, note=None):
        """Print one COMPLETE parseable result line (consumers take the
        last line; each emission is a valid artifact on its own)."""
        head = strict or fast
        result = {
            "metric": "train_slices_per_sec_per_chip",
            "value": head["slices_per_s_per_chip"],
            "unit": "slices/s/chip",
            "vs_baseline": round(head["slices_per_s_per_chip"] / R1_BASELINE, 3),
            "semantics": "strict" if strict else "fast",
            "spatial": spatial,
            "mode": mode,
            "device": str(jax.devices()[0]),
            # the speed-of-light statement the headline must carry: ~11% MFU
            # is the architecture's number, not a scheduling gap
            "sol": {
                "peak_tflops_bf16": 197.0,
                "mxu_floor_ms": head.get("mxu_floor_ms"),
                "achieved_tflops": head.get("achieved_tflops"),
                "mfu": head.get("mfu"),
                "statement": (
                    "MFU is architecture-bound at reference parity: the "
                    "discriminator's 64-256ch VALID convs at odd extents "
                    "(126^3/124^3/61^3/29^3) pad every MXU tile and carry "
                    "~93% of step FLOPs; 70% of remaining non-conv time "
                    "measured AT the practical HBM roofline (physical "
                    "tile-padded bytes vs the 690 GB/s on-chip-calibrated "
                    "streaming peak, strict step, post-routing), 78% at "
                    ">=50%. See BENCH_NOTES.md 'Speed of light' for the "
                    "measured budget."),
            },
        }
        if strict:
            result["strict"] = strict
        if fast:
            result["fast"] = fast
        # inference is measured ONCE (BN-folded serving path — train-step
        # semantics don't touch it); surface it from whichever phase ran it
        for phase in (strict, fast):
            if phase and "infer_vols_per_s" in phase:
                result["infer_vols_per_s"] = phase["infer_vols_per_s"]
                result["infer_path"] = phase["infer_path"]
                break
        if note:
            result["note"] = note
        print(json.dumps(result), flush=True)

    strict = fast = None
    if semantics in ("strict", "both"):
        strict = measure(reuse_g=False, fused=False, measure_inference=True)
        emit(strict, None)  # the artifact is safe from this moment on
    if semantics in ("fast", "both"):
        if remaining() < 180 and strict is not None:
            emit(strict, None, note="budget too low for fast phase; "
                                    "strict-only artifact")
            return
        try:
            # inference (BN-folded serving) was already measured in the
            # strict phase if it ran; don't burn budget re-measuring the
            # identical path
            fast = measure(reuse_g=fast_reuse, fused=fast_fused,
                           measure_inference=strict is None)
        except BenchFatal as e:
            if strict is None:
                raise
            emit(strict, None, note=f"fast phase failed ({e}); "
                                    "strict-only artifact")
            return
        emit(strict, fast)


# --------------------------------------------------------------------------
# Parent: stdlib-only watchdog that owns stdout and cannot hang
# --------------------------------------------------------------------------

def parent_main() -> None:
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1080"))
    env = dict(os.environ, BENCH_CHILD="1")
    t0 = time.time()
    # Binary, UNBUFFERED pipe + manual line splitting: select() fires on the
    # underlying fd, so a buffered readline() could strand a second line
    # (e.g. the strict line and the strict+fast line arriving in one pipe
    # chunk) inside the TextIOWrapper where select never sees it again —
    # and the timeout path would then kill the child without draining it,
    # losing a completed measurement. os.read gives us exactly what the
    # pipe holds.
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        env=env, stdout=subprocess.PIPE, stderr=sys.stderr, bufsize=0)

    last_parsed = None
    timed_out = False
    import selectors

    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    buf = b""

    def consume(data: bytes) -> None:
        """Split complete lines out of the carry buffer; parse/pass through."""
        nonlocal buf, last_parsed
        buf += data
        while b"\n" in buf:
            raw, buf = buf.split(b"\n", 1)
            line = raw.decode("utf-8", "replace").strip()
            if not line:
                continue
            try:
                parsed = json.loads(line)
            except json.JSONDecodeError:
                parsed = None
            if isinstance(parsed, dict) and "metric" in parsed:
                last_parsed = parsed
                print(line, flush=True)  # pass through, last line wins
            else:
                print(f"# child: {line}", file=sys.stderr, flush=True)

    def drain() -> None:
        """Pull whatever the pipe still holds (bounded, non-blocking-ish)."""
        try:
            os.set_blocking(proc.stdout.fileno(), False)
        except OSError:
            return
        for _ in range(1024):
            try:
                data = os.read(proc.stdout.fileno(), 65536)
            except (BlockingIOError, OSError):
                break
            if not data:
                break
            consume(data)
        # a final partial line without trailing newline still counts
        if buf.strip():
            consume(b"\n")

    while True:
        left = budget_s - (time.time() - t0)
        if left <= 0:
            timed_out = True
            break
        if not sel.select(timeout=min(left, 5.0)):
            if proc.poll() is not None:
                break
            continue
        try:
            data = os.read(proc.stdout.fileno(), 65536)
        except OSError:
            data = b""
        if data == b"":
            if proc.poll() is not None:
                break
            continue
        consume(data)

    if timed_out:
        drain()  # a completed line may have landed just before the deadline
        try:
            proc.kill()  # direct kill of the known child pid
        except OSError:
            pass
        drain()
        if last_parsed is not None:
            last_parsed["note"] = (
                f"wall-clock budget ({budget_s:.0f}s) exhausted after this "
                "phase; later phases skipped")
            print(json.dumps(last_parsed), flush=True)
        else:
            print(json.dumps({
                "metric": "train_slices_per_sec_per_chip",
                "value": None,
                "unit": "slices/s/chip",
                "vs_baseline": None,
                "error": f"bench exceeded BENCH_BUDGET_S={budget_s:.0f}s "
                         "with no measurement (backend hang?)",
                "last_known": LAST_KNOWN,
            }), flush=True)
        return

    rc = proc.wait()
    drain()  # anything still in the pipe, including a final partial line
    if last_parsed is None:
        print(json.dumps({
            "metric": "train_slices_per_sec_per_chip",
            "value": None,
            "unit": "slices/s/chip",
            "vs_baseline": None,
            "error": f"bench child exited rc={rc} with no parseable result",
            "last_known": LAST_KNOWN,
        }), flush=True)


def main() -> None:
    if os.environ.get("BENCH_CHILD") == "1":
        try:
            child_main()
        except BenchFatal as e:
            print(json.dumps({
                "metric": "train_slices_per_sec_per_chip",
                "value": None,
                "unit": "slices/s/chip",
                "vs_baseline": None,
                "error": f"fatal backend error: {e}",
                "last_known": LAST_KNOWN,
            }), flush=True)
            raise SystemExit(3)
    else:
        parent_main()


if __name__ == "__main__":
    main()
