"""Benchmark: batched G1 scalar-mul STARK proving throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Headline metric (BASELINE.md): G1 scalar-mul STARK op-proofs/s.  One
batched proof covers BENCH_OPS ops (default 128 = one full 2^16-row trace,
the reference's test batch size, scalar_mul_stark.rs:554); throughput =
ops / wall-clock of the steady-state prove (trace generation + full STARK
prove) after one warmup iteration.  vs_baseline is against the driver
target of 100 proofs/s (BASELINE.json, v5p-8 target vs this single chip).

Env knobs: BENCH_OPS (ops per proof), BENCH_DEADLINE_S (watchdog: print the
best measurement obtained so far and exit before an external `timeout`
would kill the process with nothing on stdout — the round-3 driver run
died mid-cold-compile with rc 124 and no JSON line).
"""

import json
import os
import pathlib
import sys
import threading
import time

import jax

jax.config.update("jax_enable_x64", True)

# Emission is single-shot: the watchdog thread and the main thread race
# only at the very end (main between its final _emit and os._exit); the
# lock + done flag guarantee exactly ONE JSON line ever reaches stdout
# (round-4 advisor finding: an interleaved/duplicate line could make a
# first-line parser pick the stale warmup-based result).
_EMIT_LOCK = threading.Lock()
_EMITTED = False
_cache = pathlib.Path(__file__).resolve().parent / f".jax_cache_{jax.default_backend()}"
_cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np

# Shared state the watchdog reads.  The watchdog runs on a side thread so
# it fires even while the main thread is blocked inside one long XLA
# compile/execute call (where a SIGALRM handler would starve).
_BEST = {"json": None, "phase": "startup", "t0": time.time()}


def _emit(obj) -> bool:
    """Write the single result line; returns False if one was already out."""
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return False
        _EMITTED = True
        sys.stdout.write(json.dumps(obj) + "\n")
        sys.stdout.flush()
        return True


def _watchdog(deadline_s: float) -> None:
    remaining = _BEST["t0"] + deadline_s - time.time()
    if remaining > 0:
        time.sleep(remaining)
    if _BEST["json"] is not None:
        # A watchdog-emitted value is NOT a steady-state measurement: it is
        # derived from the warmup wall (which includes the cold XLA
        # compile) and understates throughput.  `degraded: true` makes that
        # machine-detectable (round-4 advisor finding: the driver would
        # otherwise accept it as a real number).
        _BEST["json"]["degraded"] = True
        _BEST["json"]["note"] = (
            f"watchdog: deadline {deadline_s:.0f}s hit during phase "
            f"'{_BEST['phase']}'; value is the best measurement completed "
            "so far (warmup wall includes cold XLA compile)"
        )
        if _emit(_BEST["json"]):
            os._exit(0 if _BEST["json"].get("verified") else 3)
        return  # main already emitted the real result; let it exit
    _emit(
        {
            "metric": "g1_scalar_mul_proofs_per_s",
            "value": 0.0,
            "unit": "proofs/s",
            "vs_baseline": 0.0,
            "degraded": True,
            "note": (
                f"watchdog: cold start exceeded the {deadline_s:.0f}s "
                f"deadline in phase '{_BEST['phase']}' before any proof "
                "completed; rerun with a warm .jax_cache to measure"
            ),
        }
    )
    os._exit(3)


def main():
    # Measured cold on the chip (round 4): warmup 1600.6s + verify +
    # 3.2s steady ≈ 1660s total; the round-2 driver run passed at ~1700s,
    # so its timeout is ≥ ~1750s.  1700 leaves margin on both sides.
    deadline = float(os.environ.get("BENCH_DEADLINE_S", "1700"))
    threading.Thread(target=_watchdog, args=(deadline,), daemon=True).start()
    import plonky2_bn254_tpu  # noqa: F401
    from plonky2_bn254_tpu.bn254 import oracle
    from plonky2_bn254_tpu.prover import prove as prove_mod
    from plonky2_bn254_tpu.prover import verify as verify_mod
    from plonky2_bn254_tpu.prover.config import DEFAULT_CONFIG
    from plonky2_bn254_tpu.starks import g1_scalar_mul
    from plonky2_bn254_tpu.starks.table import g1_scalar_mul_stark
    from plonky2_bn254_tpu.utils.timing import TimingTree

    n_ops = int(os.environ.get("BENCH_OPS", "128"))
    rng = np.random.default_rng(2024)
    inputs = [
        (
            int(rng.integers(1, 1 << 63)) << 192 | int(rng.integers(0, 1 << 63)),
            oracle.random_g1(rng),
            oracle.random_g1(rng),
            t,
        )
        for t in range(n_ops)
    ]
    stark = g1_scalar_mul_stark()
    ctl_values = g1_scalar_mul.generate_ctl_values(inputs)

    def one_proof(tt=None):
        tt = tt or TimingTree(enabled=False)
        with tt.scope("trace gen"):
            trace = g1_scalar_mul.generate_trace(inputs)
        return prove_mod.prove(stark, trace, ctl_values, DEFAULT_CONFIG, timing=tt)

    # warmup (compilation; cached persistently across runs)
    _BEST["phase"] = "warmup prove (cold XLA compile)"
    t0 = time.time()
    proof = one_proof()
    warm = time.time() - t0
    print(f"# warmup prove: {warm:.1f}s", file=sys.stderr)
    _BEST["json"] = {
        "metric": "g1_scalar_mul_proofs_per_s",
        "value": round(n_ops / warm, 3),
        "unit": "proofs/s",
        "vs_baseline": round(n_ops / warm / 100.0, 4),
        "verified": False,
    }

    # correctness gate: the proof must verify
    _BEST["phase"] = "verify"
    verify_mod.verify(stark, proof, ctl_values, DEFAULT_CONFIG)
    print("# proof verified", file=sys.stderr)
    _BEST["json"]["verified"] = True

    _BEST["phase"] = "steady-state prove"
    tt = TimingTree(enabled=True)
    t0 = time.time()
    one_proof(tt)
    steady = time.time() - t0
    print(f"# steady-state prove (instrumented): {steady:.1f}s", file=sys.stderr)
    print("# stage breakdown:", file=sys.stderr)
    tt.print(out=sys.stderr)

    # un-instrumented pass: the per-stage scopes sync the device between
    # sub-stages, which the production caller does not do — measure the
    # real pipelined throughput and report the better of the two
    _BEST["phase"] = "steady-state prove (pipelined)"
    t0 = time.time()
    one_proof()
    steady_plain = time.time() - t0
    print(f"# steady-state prove (pipelined): {steady_plain:.1f}s", file=sys.stderr)
    steady = min(steady, steady_plain)

    value = n_ops / steady
    stages = {}
    for _, name, secs in tt.records:
        stages[name] = round(stages.get(name, 0.0) + secs, 3)
    _emit(
        {
            "metric": "g1_scalar_mul_proofs_per_s",
            "value": round(value, 3),
            "unit": "proofs/s",
            "vs_baseline": round(value / 100.0, 4),
            "stages_s": stages,
        }
    )
    # the watchdog thread must not fire after the real result is out
    os._exit(0)


if __name__ == "__main__":
    main()
