"""Serving loop: JSONL jobs in, JSONL results out, survives bad jobs."""

import json
import os

import numpy as np
import pytest


def _write_inputs(tmp_path, rng):
    from PIL import Image

    c = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
    s = (rng.random((44, 36, 3)) * 255).astype(np.uint8)
    cp, sp = str(tmp_path / "c.png"), str(tmp_path / "s.png")
    Image.fromarray(c).save(cp)
    Image.fromarray(s).save(sp)
    return cp, sp


def _serve(tmp_path, jobs, extra=()):
    from strotss_tpu.serve import main

    jp = str(tmp_path / "jobs.jsonl")
    rp = str(tmp_path / "results.jsonl")
    with open(jp, "w") as f:
        for job in jobs:
            f.write((job if isinstance(job, str) else json.dumps(job)) + "\n")
    rc = main(["--jobs", jp, "--results", rp,
               "--level", "1", "--max_iter", "2",
               "--compute_dtype", "float32", "--no_pallas",
               "--taps", "block1_conv1", *extra])
    assert rc == 0
    with open(rp) as f:
        return [json.loads(line) for line in f]


@pytest.mark.slow
def test_serve_singles_and_bad_jobs(tmp_path, rng):
    cp, sp = _write_inputs(tmp_path, rng)
    o1, o2 = str(tmp_path / "o1.jpg"), str(tmp_path / "o2.jpg")
    results = _serve(tmp_path, [
        {"content": cp, "style": sp, "output": o1},
        "this is not json {",
        {"content": str(tmp_path / "missing.png"), "style": sp,
         "output": str(tmp_path / "o_bad.jpg")},
        {"content": cp, "style": sp},  # missing 'output'
        # same shapes as job 1 -> reuses the in-process compiled programs
        {"content": cp, "style": sp, "output": o2, "seed": 7},
    ])
    assert [r["ok"] for r in results] == [True, False, False, False, True]
    assert os.path.exists(o1) and os.path.exists(o2)
    assert "FileNotFoundError" in results[2]["error"]
    assert "output" in results[3]["error"]
    assert results[0]["seconds"] > 0 and "loss" in results[0]
    # different seeds -> different images (the per-job override is live)
    from PIL import Image

    a = np.asarray(Image.open(o1)).astype(int)
    b = np.asarray(Image.open(o2)).astype(int)
    assert a.shape == b.shape and np.abs(a - b).max() > 0


@pytest.mark.slow
def test_serve_batch_groups_same_shape_jobs(tmp_path, rng):
    cp, sp = _write_inputs(tmp_path, rng)
    outs = [str(tmp_path / f"b{i}.jpg") for i in range(4)]
    results = _serve(tmp_path, [
        {"content": cp, "style": sp, "output": outs[0]},
        # alpha rides the pair axis (round 4): an alpha override BATCHES
        {"content": cp, "style": sp, "output": outs[1], "alpha": 8.0},
        {"content": cp, "style": sp, "output": outs[2]},
        # program-shaping overrides still opt out -> flushes the pending
        # group (here size 1 -> runs single) and runs single itself
        {"content": cp, "style": sp, "output": outs[3], "start_level": 0},
    ], extra=("--batch", "2"))
    assert [r["ok"] for r in results] == [True, True, True, True]
    assert results[0].get("batched") == 2 and results[1].get("batched") == 2
    assert "batched" not in results[2] and "batched" not in results[3]
    for o in outs:
        assert os.path.exists(o)
    # the per-pair alpha is live INSIDE the batch: same content/style/seed,
    # different alpha -> different stylizations
    from PIL import Image

    a = np.asarray(Image.open(outs[0])).astype(int)
    b = np.asarray(Image.open(outs[1])).astype(int)
    assert np.abs(a - b).max() > 0


@pytest.mark.slow
def test_serve_full_batch_flushes_before_next_read(tmp_path, rng,
                                                   monkeypatch):
    """A queue feeding stdin must get batch results as soon as the batch
    fills — not when the NEXT job (possibly hours later) arrives."""
    from strotss_tpu.serve import main

    cp, sp = _write_inputs(tmp_path, rng)
    outs = [str(tmp_path / f"f{i}.jpg") for i in range(2)]
    rp = str(tmp_path / "flush_results.jsonl")

    class _Queue:
        """stdin stand-in: serve reads with readline() (so SIGTERM can
        interrupt the blocking read — see _job_lines)."""

        def __init__(self):
            self.lines = [json.dumps({"content": cp, "style": sp,
                                      "output": o}) + "\n" for o in outs]

        def readline(self):
            if self.lines:
                return self.lines.pop(0)
            # the batch is full (2/2): its results must already be out
            # before the loop comes back to read another line
            with open(rp) as f:
                done = [json.loads(line) for line in f]
            assert len(done) == 2 and all(r["ok"] for r in done), done
            return ""

    monkeypatch.setattr("sys.stdin", _Queue())
    rc = main(["--jobs", "-", "--results", rp, "--batch", "2",
               "--level", "1", "--max_iter", "2",
               "--compute_dtype", "float32", "--no_pallas",
               "--taps", "block1_conv1"])
    assert rc == 0


@pytest.mark.slow
def test_serve_batch_failure_falls_back_to_singles(tmp_path, rng):
    """One bad job must not take down its batch-mates: the batch retries
    singly, good jobs complete, the bad one carries the precise error."""
    cp, sp = _write_inputs(tmp_path, rng)
    ok_out = str(tmp_path / "good.jpg")
    bad_out = str(tmp_path / "no_such_dir" / "bad.jpg")  # unwritable
    results = _serve(tmp_path, [
        {"content": cp, "style": sp, "output": ok_out},
        {"content": cp, "style": sp, "output": bad_out},
    ], extra=("--batch", "2"))
    assert [r["ok"] for r in results] == [True, False]
    assert os.path.exists(ok_out)
    assert "batched" not in results[0]  # completed via the single fallback
    assert "FileNotFoundError" in results[1]["error"]


@pytest.mark.slow
def test_serve_warmup_and_batch_loss(tmp_path, rng):
    """--warmup runs synthetic jobs through the serving path before any
    real job; batched results carry their per-pair final loss."""
    cp, sp = _write_inputs(tmp_path, rng)
    outs = [str(tmp_path / f"w{i}.jpg") for i in range(2)]
    # content:style sizes match the real jobs' bucket exactly, so the
    # warmup pre-compiles the very programs the jobs then reuse
    results = _serve(tmp_path, [
        {"content": cp, "style": sp, "output": outs[0]},
        {"content": cp, "style": sp, "output": outs[1]},
    ], extra=("--batch", "2", "--warmup", "40x48:44x36"))
    assert [r["ok"] for r in results] == [True, True]
    assert all(r.get("batched") == 2 for r in results)
    assert all(np.isfinite(r["loss"]) for r in results)
    # warmup artifacts must not leak into results
    assert len(results) == 2


def test_serve_warmup_rejects_bad_spec(tmp_path, rng):
    from strotss_tpu.serve import main

    with pytest.raises(ValueError, match="HxW"):
        main(["--jobs", str(tmp_path / "none.jsonl"),
              "--warmup", "not-a-size"])


def test_image_size_matches_load_image(tmp_path, rng):
    from PIL import Image

    from strotss_tpu.utils.io import image_size, load_image

    img = (rng.random((37, 51, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "odd.png")
    Image.fromarray(img).save(p)
    for ms in (None, 24, 96):  # identity, downscale, upscale
        assert image_size(p, max_size=ms) == load_image(
            p, max_size=ms).shape[1:3]
    with pytest.raises(FileNotFoundError):
        image_size(str(tmp_path / "nope.png"))


@pytest.mark.slow
def test_serve_stdin_stream(tmp_path, rng, monkeypatch):
    import io as _io

    from strotss_tpu.serve import main

    cp, sp = _write_inputs(tmp_path, rng)
    op = str(tmp_path / "stdin_out.jpg")
    rp = str(tmp_path / "stdin_results.jsonl")
    jobs = json.dumps({"content": cp, "style": sp, "output": op}) + "\n"
    monkeypatch.setattr("sys.stdin", _io.StringIO(jobs))
    rc = main(["--jobs", "-", "--results", rp,
               "--level", "1", "--max_iter", "2",
               "--compute_dtype", "float32", "--no_pallas",
               "--taps", "block1_conv1"])
    assert rc == 0
    with open(rp) as f:
        results = [json.loads(line) for line in f]
    assert len(results) == 1 and results[0]["ok"]
    assert os.path.exists(op)


@pytest.mark.slow
def test_serve_stdout_is_pure_jsonl(tmp_path, rng, capsys):
    """Default results stream (stdout) must be machine-readable: every
    stdout line parses as JSON; the shared logger (weights loader,
    write_image, the final summary) is routed to stderr by serve."""
    from strotss_tpu.serve import main

    cp, sp = _write_inputs(tmp_path, rng)
    jp = str(tmp_path / "jobs.jsonl")
    with open(jp, "w") as f:
        f.write(json.dumps({"content": cp, "style": sp,
                            "output": str(tmp_path / "o.jpg")}) + "\n")
        f.write("not json {\n")
    rc = main(["--jobs", jp, "--level", "1", "--max_iter", "2",
               "--compute_dtype", "float32", "--no_pallas",
               "--taps", "block1_conv1"])
    assert rc == 0
    out, err = capsys.readouterr()
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) == 2, f"expected 2 result lines, got: {lines!r}"
    results = [json.loads(ln) for ln in lines]  # raises if interleaved
    assert [r["ok"] for r in results] == [True, False]
    assert "Served 1 jobs" in err, "log lines must land on stderr"


@pytest.mark.slow
def test_serve_sigterm_while_reading_drains_pending(tmp_path, rng,
                                                    monkeypatch):
    """SIGTERM while blocked reading the job stream (the idle state of a
    queue-fed deployment) interrupts the wait, runs the queued-but-
    unstarted pending jobs, and exits 0."""
    import threading

    if threading.current_thread() is not threading.main_thread():
        pytest.skip("signal handlers require the main thread")
    import signal

    from strotss_tpu import serve

    cp, sp = _write_inputs(tmp_path, rng)
    op = str(tmp_path / "drain_out.jpg")
    rp = str(tmp_path / "drain_results.jsonl")

    class SigtermStdin:
        """One batchable job, then SIGTERM arrives while the loop is
        blocked waiting for the next line — the drain-flag poll in
        _LineReader.readline must observe it and end the stream."""

        def __init__(self, lines):
            self.lines = list(lines)
            self.blocked = threading.Event()

        def readline(self):
            if self.lines:
                return self.lines.pop(0)
            signal.raise_signal(signal.SIGTERM)  # delivered to main thread
            self.blocked.wait()  # stay blocked, like an idle stdin pipe
            return ""

    job = json.dumps({"content": cp, "style": sp, "output": op}) + "\n"
    fake = SigtermStdin([job])
    monkeypatch.setattr("sys.stdin", fake)
    before = signal.getsignal(signal.SIGTERM)
    # --batch 2: the job goes PENDING (waiting for a batch-mate), so only
    # the drain path can have produced its result
    rc = serve.main(["--jobs", "-", "--results", rp, "--batch", "2",
                     "--level", "1", "--max_iter", "2",
                     "--compute_dtype", "float32", "--no_pallas",
                     "--taps", "block1_conv1"])
    fake.blocked.set()  # release the reader thread
    assert rc == 0
    assert signal.getsignal(signal.SIGTERM) is before, "handler restored"
    with open(rp) as f:
        results = [json.loads(line) for line in f]
    assert len(results) == 1 and results[0]["ok"]
    assert os.path.exists(op)


@pytest.mark.slow
def test_serve_sigterm_mid_job_finishes_job_then_exits(tmp_path, rng,
                                                       monkeypatch):
    """SIGTERM during job execution must NOT interrupt it (torn output
    files); the job finishes and emits, then the loop stops reading."""
    import threading

    if threading.current_thread() is not threading.main_thread():
        pytest.skip("signal handlers require the main thread")
    import signal

    from strotss_tpu import serve

    cp, sp = _write_inputs(tmp_path, rng)
    o1 = str(tmp_path / "mid1.jpg")
    o2 = str(tmp_path / "mid2.jpg")

    orig = serve._run_single

    def run_single_then_sigterm(args, job, vgg_params):
        result = orig(args, job, vgg_params)
        signal.raise_signal(signal.SIGTERM)  # mid-job: only sets the
        return result                        # draining flag, never raises

    monkeypatch.setattr(serve, "_run_single", run_single_then_sigterm)
    jp = str(tmp_path / "mid_jobs.jsonl")
    rp = str(tmp_path / "mid_results.jsonl")
    with open(jp, "w") as f:
        f.write(json.dumps({"content": cp, "style": sp, "output": o1}) + "\n")
        f.write(json.dumps({"content": cp, "style": sp, "output": o2}) + "\n")
    rc = serve.main(["--jobs", jp, "--results", rp,
                     "--level", "1", "--max_iter", "2",
                     "--compute_dtype", "float32", "--no_pallas",
                     "--taps", "block1_conv1"])
    assert rc == 0
    with open(rp) as f:
        results = [json.loads(line) for line in f]
    # job 1 completed and emitted; job 2 was never started
    assert len(results) == 1 and results[0]["ok"]
    assert os.path.exists(o1) and not os.path.exists(o2)


@pytest.mark.slow
def test_serve_data_devices_shards_full_batches(tmp_path, rng):
    """--data_devices D shards full batch groups over a 'data' mesh (the
    8 virtual CPU devices stand in for a pod slice, via the explicit
    --allow_cpu_devices opt-in); non-divisible flush groups fall back to
    unsharded."""
    cp, sp = _write_inputs(tmp_path, rng)
    outs = [str(tmp_path / f"dd{i}.jpg") for i in range(3)]
    results = _serve(tmp_path, [
        {"content": cp, "style": sp, "output": outs[0]},
        {"content": cp, "style": sp, "output": outs[1]},
        {"content": cp, "style": sp, "output": outs[2]},  # flush of 1
    ], extra=("--batch", "2", "--data_devices", "2", "--allow_cpu_devices"))
    assert [r["ok"] for r in results] == [True, True, True]
    assert results[0].get("data_devices") == 2
    assert results[1].get("data_devices") == 2
    assert "data_devices" not in results[2] and "batched" not in results[2]
    for o in outs:
        assert os.path.exists(o)


def test_serve_data_devices_validation(tmp_path):
    from strotss_tpu.serve import main

    jp = str(tmp_path / "empty.jsonl")
    open(jp, "w").close()
    # not a divisor of --batch
    assert main(["--jobs", jp, "--batch", "4", "--data_devices", "3"]) == 2
    # batching off
    assert main(["--jobs", jp, "--data_devices", "2"]) == 2
    # more devices than the accelerator offers, without the explicit
    # --allow_cpu_devices opt-in -> fail fast, never degrade silently
    import jax

    if len(jax.devices()) < 2:
        assert main(["--jobs", jp, "--batch", "2",
                     "--data_devices", "2"]) == 2


def test_line_reader_grace_recovers_consumed_line():
    """A line the reader thread consumes from the stream right as the
    drain flag flips must not be dropped: readline() has already returned
    None, so _job_lines does one bounded grace read to recover it."""
    import threading

    from strotss_tpu.serve import _LineReader

    class SlowStream:
        def __init__(self):
            self.ev = threading.Event()
            self.calls = 0

        def readline(self):
            self.calls += 1
            if self.calls == 1:
                self.ev.wait()
                return '{"content": "c"}\n'
            return ""

    s = SlowStream()
    r = _LineReader(s)
    # drain observed while the read is outstanding (reader blocked)
    assert r.readline(lambda: True) is None
    # no line consumed yet: grace finds nothing within its timeout
    assert r.grace_line(timeout=0.05) is None
    # the producer lands a line — the reader consumes it from the stream
    s.ev.set()
    assert r.grace_line(timeout=5.0) == '{"content": "c"}\n'


def test_line_reader_grace_without_outstanding_read():
    import io as _io

    from strotss_tpu.serve import _LineReader

    r = _LineReader(_io.StringIO("a\n"))
    assert r.readline(lambda: False) == "a\n"
    # request satisfied: nothing outstanding, grace is a no-op
    assert r.grace_line(timeout=0.05) is None


def test_job_lines_drain_recovers_consumed_line(monkeypatch):
    """_job_lines under an immediate drain still yields a job line that
    the reader consumed during the drain window."""
    import threading

    from strotss_tpu.serve import _job_lines

    class SlowStream:
        def __init__(self):
            self.ev = threading.Event()
            self.calls = 0

        def readline(self):
            self.calls += 1
            if self.calls == 1:
                self.ev.wait()
                return '{"x": 1}\n'
            return ""

    s = SlowStream()
    monkeypatch.setattr("sys.stdin", s)
    # release the line shortly after the drain poll starts waiting; even
    # if the timer beats the first poll, the line arrives normally —
    # either way it must come out of the generator exactly once
    threading.Timer(0.3, s.ev.set).start()
    lines = list(_job_lines("-", should_stop=lambda: True))
    assert lines == ['{"x": 1}']


@pytest.mark.slow
def test_serve_warm_start_chain(tmp_path, rng):
    """A job with "init" warm-starts from a previous job's output (the
    video-chain pattern); warm/cold jobs never share a batch group —
    while cold jobs around it stay deterministic."""
    cp, sp = _write_inputs(tmp_path, rng)
    o1, o2, o3 = (str(tmp_path / f"w{i}.jpg") for i in range(3))
    results = _serve(tmp_path, [
        {"content": cp, "style": sp, "output": o1},
        {"content": cp, "style": sp, "output": o2, "init": o1},
        {"content": cp, "style": sp, "output": o3},
    ], extra=("--batch", "2"))
    assert [r["ok"] for r in results] == [True, True, True]
    # cold/warm/cold alternation -> every group flushed at size 1
    assert all("batched" not in r for r in results)
    from PIL import Image

    a, b, c = (np.asarray(Image.open(o)).astype(int) for o in (o1, o2, o3))
    # same cold job twice -> bit-identical (serving is deterministic)
    np.testing.assert_array_equal(a, c)
    # the warm start is live: same pair + seed, different seed image
    assert np.abs(a - b).max() > 0


@pytest.mark.slow
def test_serve_warm_jobs_batch_together(tmp_path, rng):
    """B interleaved video streams: consecutive warm jobs with matching
    shapes form a batch group (the batched-throughput video pattern),
    and each pair's init is live (different inits -> different outputs
    for the same content/style/seed)."""
    from PIL import Image

    cp, sp = _write_inputs(tmp_path, rng)
    # two distinct "previous frames" as inits
    i1 = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
    i2 = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
    ip1, ip2 = str(tmp_path / "i1.png"), str(tmp_path / "i2.png")
    Image.fromarray(i1).save(ip1)
    Image.fromarray(i2).save(ip2)
    o1, o2 = str(tmp_path / "s1.jpg"), str(tmp_path / "s2.jpg")
    results = _serve(tmp_path, [
        {"content": cp, "style": sp, "output": o1, "init": ip1},
        {"content": cp, "style": sp, "output": o2, "init": ip2},
    ], extra=("--batch", "2"))
    assert [r["ok"] for r in results] == [True, True]
    assert results[0].get("batched") == 2 and results[1].get("batched") == 2
    a = np.asarray(Image.open(o1)).astype(int)
    b = np.asarray(Image.open(o2)).astype(int)
    assert a.shape == b.shape and np.abs(a - b).max() > 0


@pytest.mark.slow
def test_serve_batched_warm_start_matches_single_when_shapes_differ(
        tmp_path, rng):
    """VERDICT r3 weak #2: a batched warm job whose init shape differs
    from the content shape must follow the SAME trajectory as a single
    warm run with that JOB's key (``PRNGKey(seed)`` — serve passes
    per-pair keys, so a job's trajectory is independent of batching;
    round 4). Serve's batched
    stacking path must resize each init once, directly to the first
    executed scale's chw (solve.warm_init_hw) — the old detour through
    the content shape composed two bilinear resamples and silently
    deviated exactly this case (a chained video frame whose previous
    output's shape != the content's). Job 1 carries an explicit seed
    override — which no longer opts it out of batching."""
    import jax

    from strotss_tpu.config import StrotssConfig
    from strotss_tpu.models.weights import load_vgg_params
    from strotss_tpu.solve import stylize_single
    from strotss_tpu.utils.io import load_image
    from PIL import Image

    cp, sp = _write_inputs(tmp_path, rng)  # content 40x48
    inits = []
    for i in range(2):
        arr = (rng.random((56, 64, 3)) * 255).astype(np.uint8)  # != 40x48
        p = str(tmp_path / f"init{i}.png")
        Image.fromarray(arr).save(p)
        inits.append(p)
    # outputs as PNG: lossless round-trip, so the comparison sees the
    # solver's pixels, not JPEG noise
    batched = [str(tmp_path / f"wb{i}.png") for i in range(2)]
    seeds = [0, 5]
    rb = _serve(tmp_path, [
        {"content": cp, "style": sp, "output": batched[i], "init": inits[i],
         **({"seed": seeds[i]} if seeds[i] else {})}
        for i in range(2)
    ], extra=("--batch", "2"))
    assert [r.get("batched") for r in rb] == [2, 2]
    # the library single runs serve's batched path promises to equal:
    # same config serve builds (level 1, 2 iters, f32, one tap,
    # log_every=max_iter, precompile off), per-pair key PRNGKey(job seed)
    cfg = StrotssConfig(
        levels=1, max_iter=2, log_every=2, compute_dtype="float32",
        use_pallas=False, taps=("block1_conv1",), precompile=False,
    )
    params = load_vgg_params("16", False)
    for i in range(2):
        img_s, _ = stylize_single(
            load_image(cp), load_image(sp), cfg, params,
            key=jax.random.PRNGKey(seeds[i]),
            init_image=load_image(inits[i]),
        )
        a = np.asarray(Image.open(batched[i])).astype(np.int16)
        b = np.asarray(img_s).astype(np.int16)
        # postprocess min-max renormalizes; allow 1 ulp of uint8 rounding
        assert a.shape == b.shape and np.abs(a - b).max() <= 1, (
            f"batched warm job {i} diverged from its single-run "
            f"trajectory (max diff {np.abs(a - b).max()})"
        )


def test_warm_and_cold_jobs_never_share_a_group(tmp_path, rng):
    """Warm and cold jobs run different scale-0 programs, so the batch
    signature must split them even when the images are identical."""
    from strotss_tpu.serve import _batchable, _shape_sig

    cp, sp = _write_inputs(tmp_path, rng)

    class A:
        max_size = None

    warm = {"content": cp, "style": sp, "output": "o", "init": "p.jpg"}
    cold = {"content": cp, "style": sp, "output": "o"}
    assert _batchable(warm) and _batchable(cold)
    sw, sc = _shape_sig(A(), warm), _shape_sig(A(), cold)
    assert sw is not None and sc is not None
    assert sw != sc and sw[:2] == sc[:2]


@pytest.mark.slow
def test_serve_chain_dependency_never_batches_with_producer(tmp_path, rng):
    """A warm job whose init IS a pending job's output must not join its
    producer's batch group — even when a STALE copy of that output
    already exists on disk (crash recovery / re-run), where the group's
    load would succeed and silently seed from the previous run's file."""
    from PIL import Image

    cp, sp = _write_inputs(tmp_path, rng)
    ip0 = str(tmp_path / "i0.png")
    Image.fromarray(
        (rng.random((40, 48, 3)) * 255).astype(np.uint8)).save(ip0)
    o1, o2 = str(tmp_path / "f1.jpg"), str(tmp_path / "f2.jpg")
    # stale o1 from a "previous run": loading it would NOT fail
    Image.fromarray(
        (rng.random((40, 48, 3)) * 255).astype(np.uint8)).save(o1)
    results = _serve(tmp_path, [
        {"content": cp, "style": sp, "output": o1, "init": ip0},
        {"content": cp, "style": sp, "output": o2, "init": o1},
    ], extra=("--batch", "2"))
    assert [r["ok"] for r in results] == [True, True]
    # same shapes + both warm would batch — the dependency must flush
    assert all("batched" not in r for r in results)


@pytest.mark.slow
def test_serve_multi_style_jobs(tmp_path, rng):
    """Per-job "styles"/"style_weights": blend jobs run singly (their own
    program signature) without breaking batched neighbors, and the field
    validation surfaces per-job errors instead of killing the stream."""
    from PIL import Image

    cp, sp = _write_inputs(tmp_path, rng)
    s2 = (rng.random((28, 52, 3)) * 255).astype(np.uint8)
    s2p = str(tmp_path / "s2.png")
    Image.fromarray(s2).save(s2p)
    outs = [str(tmp_path / f"m{i}.jpg") for i in range(4)]
    results = _serve(tmp_path, [
        {"content": cp, "styles": [sp, s2p], "style_weights": [0.7, 0.3],
         "output": outs[0]},
        # equal weights by default
        {"content": cp, "styles": [sp, s2p], "output": outs[1]},
        # both 'style' and 'styles' -> per-job error
        {"content": cp, "style": sp, "styles": [sp, s2p],
         "output": outs[2]},
        # 'style_weights' without 'styles' -> per-job error
        {"content": cp, "style": sp, "style_weights": [1.0],
         "output": outs[3]},
    ])
    assert [r["ok"] for r in results] == [True, True, False, False]
    assert os.path.exists(outs[0]) and os.path.exists(outs[1])
    assert "exactly one of" in results[2]["error"]
    assert "requires 'styles'" in results[3]["error"]
    a = np.asarray(Image.open(outs[0])).astype(int)
    b = np.asarray(Image.open(outs[1])).astype(int)
    # different blend weights -> different stylizations
    assert a.shape == b.shape and np.abs(a - b).max() > 0


@pytest.mark.slow
def test_serve_multi_style_flushes_batch_group(tmp_path, rng):
    """A blend job between two batchable jobs flushes the pending group
    (it is non-batchable) and the stream keeps serving."""
    cp, sp = _write_inputs(tmp_path, rng)
    s2p = str(tmp_path / "s2.png")
    from PIL import Image

    Image.fromarray(
        (rng.random((28, 52, 3)) * 255).astype(np.uint8)).save(s2p)
    outs = [str(tmp_path / f"f{i}.jpg") for i in range(3)]
    results = _serve(tmp_path, [
        {"content": cp, "style": sp, "output": outs[0]},
        {"content": cp, "styles": [sp, s2p], "output": outs[1]},
        {"content": cp, "style": sp, "output": outs[2]},
    ], extra=("--batch", "2"))
    assert [r["ok"] for r in results] == [True, True, True]
    # the blend split the stream: no group ever filled to 2
    assert all("batched" not in r for r in results)
