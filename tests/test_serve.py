"""vqvae-serve daemon: protocol round-trips and bit-exactness of the
served codec against the library engines (cli/serve.py)."""

import base64
import json
import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    """Train 4 steps, then launch the daemon on a UNIX socket."""
    root = tmp_path_factory.mktemp("serve")
    run = str(root / "run")
    from vqvae_tpu.cli.train import main as train_main
    old = sys.argv
    sys.argv = ["prog", "--preset", "tiny", "--dataset", "sine",
                "--steps", "4", "--batch-size", "8", "--out", run]
    try:
        train_main()
    finally:
        sys.argv = old

    sock_path = str(root / "codec.sock")
    # the axon TPU plugin ignores the JAX_PLATFORMS env var, so the
    # subprocess must force CPU via jax.config before the CLI runs
    # (same trick as tests/_dist_worker.py)
    boot = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import sys; sys.argv = ['vqvae-serve', '--preset', 'tiny', "
        f"'-m', {run!r}, '--socket', {sock_path!r}, '--chunk', '4']; "
        "from vqvae_tpu.cli.serve import main; main()")
    # stdout/stderr go to FILES, not pipes: warmup compiles emit
    # kilobytes of XLA warnings, and an undrained PIPE fills its 64KB
    # buffer and blocks the child before it reaches "ready"
    log_path = str(root / "server.log")
    log = open(log_path, "w")
    proc = subprocess.Popen([sys.executable, "-c", boot], stdout=log,
                            stderr=subprocess.STDOUT, text=True)
    # warmup compiles ~10 programs (prepare, upsample variants, scan
    # variants, encoder windows); budget generously for a loaded CPU
    deadline = time.time() + 900
    while not os.path.exists(sock_path):
        assert proc.poll() is None, open(log_path).read()[-3000:]
        assert time.time() < deadline, "server did not come up"
        time.sleep(0.5)
    yield {"sock": sock_path, "run": run, "proc": proc}
    if proc.poll() is None:
        try:
            _request(sock_path, {"op": "shutdown"})
        except (OSError, ValueError):
            # server gone or closed the connection before replying
            proc.terminate()
    proc.wait(timeout=60)
    log.close()


def _request(sock_path, *reqs):
    c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    c.connect(sock_path)
    out = []
    with c, c.makefile("rwb") as f:
        for req in reqs:
            f.write(json.dumps(req).encode() + b"\n")
            f.flush()
            out.append(json.loads(f.readline()))
    return out if len(out) > 1 else out[0]


def _pcm16(wav):
    pcm = np.round(np.clip(wav, -1, 1) * 32767.0).astype("<i2")
    return base64.b64encode(pcm.tobytes()).decode()


def _unpcm16(b64):
    return (np.frombuffer(base64.b64decode(b64), "<i2")
            .astype(np.float32) / 32767.0)


def test_ping(server):
    r = _request(server["sock"], {"op": "ping"})
    assert r["ok"] and r["sr"] == 16000 and r["hop"] == 64
    assert r["n_speakers"] == 4  # the valid speaker range for decode
    # the startup probe measured and exposed the realtime factor so
    # orchestrators can route live streams away from slow engines
    assert r["realtime_x"] is not None and r["realtime_x"] > 0


def test_decode_matches_library(server):
    """Served greedy decode == decode_from_codes bit-for-bit (the
    streaming-exactness contract through the socket)."""
    import jax
    import jax.numpy as jnp
    from vqvae_tpu.cli.common import load_params
    from vqvae_tpu.configs import get_config
    from vqvae_tpu.infer import decode_from_codes

    rng = np.random.default_rng(5)
    codes = rng.integers(0, 128, 11).astype(np.int32)  # ragged vs C=4
    r = _request(server["sock"],
                 {"op": "decode", "codes": codes.tolist(),
                  "speaker": 1, "greedy": True})
    assert r["ok"] and r["samples"] == 11 * 64
    got = _unpcm16(r["pcm16"])

    cfg = get_config("tiny")
    params = load_params(server["run"], cfg)
    want = np.asarray(decode_from_codes(
        params, cfg.model, jnp.asarray(codes)[None],
        jnp.asarray([1]), jax.random.PRNGKey(0), greedy=True))[0]
    # int16 PCM transport is the only loss
    np.testing.assert_allclose(got, want, atol=1.0 / 32767)


def test_decode_sampled_matches_library(server):
    """Sampled (non-greedy) served decode is ALSO bit-exact vs the
    one-shot engine at equal seed/temperature: per-step keys are
    fold_in(key, t) on the global step, so the daemon's chunked pushes
    draw the identical stream (infer/streaming.py contract)."""
    import jax
    import jax.numpy as jnp
    from vqvae_tpu.cli.common import load_params
    from vqvae_tpu.configs import get_config
    from vqvae_tpu.infer import decode_from_codes

    rng = np.random.default_rng(11)
    codes = rng.integers(0, 128, 9).astype(np.int32)   # ragged vs C=4
    r = _request(server["sock"],
                 {"op": "decode", "codes": codes.tolist(),
                  "seed": 7, "temperature": 0.9})
    assert r["ok"]
    got = _unpcm16(r["pcm16"])

    cfg = get_config("tiny")
    params = load_params(server["run"], cfg)
    want = np.asarray(decode_from_codes(
        params, cfg.model, jnp.asarray(codes)[None],
        jnp.asarray([0]), jax.random.PRNGKey(7), temperature=0.9))[0]
    np.testing.assert_allclose(got, want, atol=1.0 / 32767)


def test_encode_matches_library_and_reconstruct(server):
    """Served encode == one-shot encode (StreamingEncoder contract);
    reconstruct chains both and reports codes + audio."""
    import jax.numpy as jnp
    from vqvae_tpu.audio.mu_law import mu_law_decode, mu_law_encode
    from vqvae_tpu.cli.common import load_params
    from vqvae_tpu.configs import get_config
    from vqvae_tpu.infer.fastgen import encode_to_codes

    sr = 16000
    t = np.arange(900) / sr
    wav = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    # quantize to the PCM16 the socket will carry, so the comparison
    # encoder sees the identical waveform
    wav = _unpcm16(_pcm16(wav))

    r = _request(server["sock"], {"op": "encode", "pcm16": _pcm16(wav)})
    assert r["ok"]

    cfg = get_config("tiny")
    params = load_params(server["run"], cfg)
    T = len(wav) - len(wav) % cfg.model.hop
    x = mu_law_decode(mu_law_encode(jnp.asarray(wav[:T]), cfg.model.mu,
                                    cfg.model.mulaw_mode),
                      cfg.model.mu, mode=cfg.model.mulaw_mode)
    want = np.asarray(encode_to_codes(params, cfg.model, x[None]))[0]
    assert r["codes"] == want.tolist()

    rec = _request(server["sock"],
                   {"op": "reconstruct", "pcm16": _pcm16(wav),
                    "greedy": True})
    assert rec["ok"] and rec["codes"] == want.tolist()
    assert rec["samples"] == T
    assert np.all(np.isfinite(_unpcm16(rec["pcm16"])))


def test_python_client(server):
    """CodecClient wraps the wire protocol: numpy in/out round-trip
    and typed errors (vqvae_tpu/client.py)."""
    import pytest as _pytest

    from vqvae_tpu.client import CodecClient, ServerError

    with CodecClient(socket_path=server["sock"]) as c:
        info = c.ping()
        assert info["hop"] == 64 and info["n_speakers"] == 4
        sr = info["sr"]
        t = np.arange(640) / sr
        wav = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        out, codes = c.reconstruct(wav, speaker=2, greedy=True)
        assert codes.dtype == np.int32 and len(codes) == 10
        assert out.shape == (640,) and np.all(np.isfinite(out))
        assert np.array_equal(c.encode(wav), codes)
        dec = c.decode(codes, speaker=2, greedy=True)
        np.testing.assert_allclose(dec, out, atol=1.0 / 32767)
        with _pytest.raises(ServerError, match="speaker"):
            c.decode(codes, speaker=50)
        # out-of-range ids must error, not clamp/wrap to a wrong
        # codebook row (JAX gathers clamp; numpy wraps negatives)
        with _pytest.raises(ServerError, match="code ids"):
            c.decode([0, 10_000], greedy=True)
        with _pytest.raises(ServerError, match="code ids"):
            c.decode([-5], greedy=True)
        assert c.ping()["ok"]  # connection survives the typed error


def test_tcp_transport(server):
    """--tcp host:port serves the identical protocol over TCP."""
    # ask the OS for a free port (a pid-derived pick can collide with
    # a live listener or a concurrent suite); the tiny close->bind
    # race is acceptable for a test
    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()
    boot = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import sys; sys.argv = ['vqvae-serve', '--preset', 'tiny', "
        f"'-m', {server['run']!r}, '--tcp', '127.0.0.1:{port}', "
        "'--chunk', '4']; "
        "from vqvae_tpu.cli.serve import main; main()")
    log_path = server["run"] + "-tcp.log"
    with open(log_path, "w") as log:
        proc = subprocess.Popen([sys.executable, "-c", boot],
                                stdout=log, stderr=subprocess.STDOUT)
    try:
        deadline = time.time() + 900
        while True:
            assert proc.poll() is None, open(log_path).read()[-3000:]
            assert time.time() < deadline, "tcp server did not come up"
            try:
                c = socket.create_connection(("127.0.0.1", port),
                                             timeout=2)
                break
            except OSError:
                time.sleep(0.5)
        with c, c.makefile("rwb") as f:
            for req in ({"op": "ping"},
                        {"op": "decode", "codes": [5, 6, 7],
                         "greedy": True},
                        {"op": "shutdown"}):
                f.write(json.dumps(req).encode() + b"\n")
                f.flush()
                r = json.loads(f.readline())
                assert r["ok"], r
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.terminate()
            proc.wait(timeout=60)


def test_http_transport(server):
    """--http host:port serves the same ops over plain HTTP/1.1:
    GET /ping /stats /healthz, POST /decode with a JSON body, 400 on
    bad requests, POST /shutdown exits cleanly."""
    import urllib.error
    import urllib.request

    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()
    boot = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import sys; sys.argv = ['vqvae-serve', '--preset', 'tiny', "
        f"'-m', {server['run']!r}, '--http', '127.0.0.1:{port}', "
        "'--chunk', '4']; "
        "from vqvae_tpu.cli.serve import main; main()")
    log_path = server["run"] + "-http.log"
    base = f"http://127.0.0.1:{port}"

    def get(path):
        with urllib.request.urlopen(base + path, timeout=120) as r:
            return json.loads(r.read())

    def post(path, obj):
        req = urllib.request.Request(
            base + path, data=json.dumps(obj).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            return json.loads(r.read())

    with open(log_path, "w") as log:
        proc = subprocess.Popen([sys.executable, "-c", boot],
                                stdout=log, stderr=subprocess.STDOUT)
    try:
        deadline = time.time() + 900
        while True:
            assert proc.poll() is None, open(log_path).read()[-3000:]
            assert time.time() < deadline, "http server did not come up"
            try:
                ping = get("/ping")
                break
            except OSError:
                time.sleep(0.5)
        assert ping["ok"] and ping["hop"] == 64
        assert get("/healthz")["ok"]
        r = post("/decode", {"codes": [5, 6, 7], "greedy": True})
        assert r["ok"] and r["samples"] == 3 * 64
        # errors: JSON error body + HTTP status code
        with pytest.raises(urllib.error.HTTPError) as ei:
            post("/decode", {"codes": [5], "speaker": 99})
        assert ei.value.code == 400
        assert "speaker" in json.loads(ei.value.read())["error"]
        with pytest.raises(urllib.error.HTTPError) as ei:
            get("/nope")
        assert ei.value.code == 404
        # negative Content-Length must be rejected up front: read(-1)
        # would buffer until EOF/timeout, bypassing the size cap
        raw = socket.create_connection(("127.0.0.1", port), timeout=30)
        with raw:
            raw.sendall(b"POST /decode HTTP/1.1\r\n"
                        b"Host: x\r\nContent-Length: -1\r\n\r\n")
            assert b" 400 " in raw.recv(4096)
        s = get("/stats")
        assert s["ops"]["decode"]["count"] == 2
        assert s["ops"]["decode"]["errors"] == 1
        assert s["ops"]["decode"]["ms"]["p50"] > 0
        # the HTTP transport tracks connections too (ADVICE r3)
        assert s["connections"]["total"] > 0
        assert post("/shutdown", {})["ok"]
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.terminate()
            proc.wait(timeout=60)


def test_stats_op(server):
    """The socket transports carry the same accounting: counters and
    latency percentiles move with requests, errors are counted."""
    from vqvae_tpu.client import CodecClient

    with CodecClient(socket_path=server["sock"]) as c:
        before = c.stats()
        c.decode([1, 2, 3], greedy=True)
        after = c.stats()
    d0 = before["ops"].get("decode", {"count": 0, "errors": 0})
    d1 = after["ops"]["decode"]
    assert d1["count"] == d0["count"] + 1
    assert d1["errors"] == d0["errors"]   # the greedy decode succeeded
    assert d1["ms"]["p50"] > 0 and d1["ms"]["max"] >= d1["ms"]["p50"]
    assert after["uptime_s"] >= before["uptime_s"]
    assert after["connections"]["total"] > 0


def test_request_size_cap(monkeypatch, tmp_path):
    """An oversized request line answers an error and drops that
    connection (instead of buffering unbounded bytes); the daemon
    itself survives and serves fresh connections."""
    import threading
    import types

    from vqvae_tpu.cli import serve as S

    monkeypatch.setattr(S, "MAX_REQUEST_BYTES", 1024)
    codec = types.SimpleNamespace(
        cfg=types.SimpleNamespace(
            model=types.SimpleNamespace(hop=64, K=128, mu=256,
                                        n_speakers=4),
            data=types.SimpleNamespace(sr=16000), name="stub"),
        chunk=4, engine="stream")
    sock_path = str(tmp_path / "cap.sock")
    t = threading.Thread(target=S.serve, args=(codec, sock_path),
                         daemon=True)
    t.start()
    deadline = time.time() + 30
    while not os.path.exists(sock_path):
        assert time.time() < deadline
        time.sleep(0.05)
    c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    c.connect(sock_path)
    with c, c.makefile("rwb") as f:
        f.write(b'{"op": "ping", "pad": "' + b"x" * 2048 + b'"}\n')
        f.flush()
        r = json.loads(f.readline())
        assert r["ok"] is False and "exceeds" in r["error"]
        assert f.readline() == b""   # connection was dropped
    r = _request(sock_path, {"op": "ping"})   # daemon still alive
    assert r["ok"]
    _request(sock_path, {"op": "shutdown"})
    t.join(timeout=10)
    assert not t.is_alive()


def test_idle_client_does_not_starve_others(server):
    """Connections are concurrent (thread per client, device work
    serialized): a client that connects and sends nothing must not
    block another client's requests."""
    idle = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    idle.connect(server["sock"])
    try:
        t0 = time.time()
        r = _request(server["sock"], {"op": "ping"})
        assert r["ok"] and time.time() - t0 < 30
    finally:
        idle.close()


def test_bad_request_keeps_daemon_alive(server):
    bad, spk, ping = _request(server["sock"],
                              {"op": "decode", "codes": "nope"},
                              {"op": "decode", "codes": [1, 2, 3],
                               "speaker": 99},
                              {"op": "ping"})
    assert bad["ok"] is False and "error" in bad
    # gathers clamp out of range: must error, not serve a wrong voice
    assert spk["ok"] is False and "speaker" in spk["error"]
    assert ping["ok"] is True  # same connection still served


def test_stream_session_codes_matches_oneshot(server):
    """A live codes stream (stream_open/push/close) emits audio push
    by push whose concatenation is BIT-identical to the one-shot
    decode request of the same codes — greedy AND sampled (the
    fold_in(key, t) / resumable-state contracts through the wire)."""
    from vqvae_tpu.client import CodecClient

    rng = np.random.default_rng(21)
    codes = rng.integers(0, 128, 23).astype(np.int32)
    with CodecClient(socket_path=server["sock"]) as c:
        for kw in ({"greedy": True}, {"seed": 9, "temperature": 0.9}):
            want = c.decode(codes, speaker=1, **kw)
            with c.open_stream(speaker=1, **kw) as s:
                pieces = [s.push_codes(codes[:5]),
                          s.push_codes(codes[5:6]),
                          s.push_codes(codes[6:20]),
                          s.push_codes(codes[20:])]
                pieces.append(s.close())
            got = np.concatenate(pieces)
            assert np.array_equal(got, want), kw


def test_stream_session_pcm_full_duplex(server):
    """pcm-mode stream == one-shot reconstruct: the exact streaming
    encoder feeds the decode session live, over one connection."""
    from vqvae_tpu.client import CodecClient

    sr = 16000
    t = np.arange(1100) / sr
    wav = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wav = _unpcm16(_pcm16(wav))   # the PCM16 the socket carries
    with CodecClient(socket_path=server["sock"]) as c:
        want, _ = c.reconstruct(wav, greedy=True)
        with c.open_stream(mode="pcm", greedy=True) as s:
            assert s.lookahead_samples > 0   # encoder latency floor
            pieces = [s.push_pcm(wav[:300]), s.push_pcm(wav[300:301]),
                      s.push_pcm(wav[301:900]), s.push_pcm(wav[900:])]
            pieces.append(s.close())
        got = np.concatenate(pieces)
    assert np.array_equal(got, want)


def test_stream_session_errors_and_reaping(server):
    """Unknown sessions error; a push that raises reaps its session;
    the per-connection session cap holds; other requests still work."""
    from vqvae_tpu.client import CodecClient, ServerError

    with CodecClient(socket_path=server["sock"]) as c:
        with pytest.raises(ServerError, match="unknown session"):
            c._request({"op": "stream_push", "session": "nope",
                        "codes": [1]})
        s = c.open_stream(greedy=True)
        with pytest.raises(ServerError, match="code ids"):
            s.push_codes([99999])
        # the failed push reaped the session
        with pytest.raises(ServerError, match="unknown session"):
            s.push_codes([1])
        s._open = False   # don't double-close in __exit__
        handles = [c.open_stream(greedy=True) for _ in range(4)]
        with pytest.raises(ServerError, match="sessions"):
            c.open_stream(greedy=True)
        for h in handles:
            h.close()
        assert c.ping()["ok"]   # connection healthy throughout


def test_stream_ops_rejected_off_socket_transports():
    """Without a per-connection session registry (HTTP), stream ops
    answer a client error instead of crashing."""
    import types

    from vqvae_tpu.cli.serve import handle

    codec = types.SimpleNamespace(
        cfg=types.SimpleNamespace(
            model=types.SimpleNamespace(hop=64, K=128, mu=256,
                                        n_speakers=4),
            data=types.SimpleNamespace(sr=16000), name="stub"),
        chunk=4, engine="stream")
    r = handle(codec, {"op": "stream_open"}, sessions=None)
    assert r["ok"] is False and "socket transport" in r["error"]


def test_answer_error_kind_and_lockfree_ops():
    """answer() classifies failures (client vs internal — the HTTP
    status split) and serves ping/stats WITHOUT the device lock, so a
    minutes-long decode never blocks health checks."""
    import threading
    import types

    from vqvae_tpu.cli.serve import Stats, answer

    cfg = types.SimpleNamespace(
        model=types.SimpleNamespace(hop=64, K=128, mu=256,
                                    n_speakers=4),
        data=types.SimpleNamespace(sr=16000), name="stub")

    def boom(*a, **k):
        raise RuntimeError("device fell over")

    codec = types.SimpleNamespace(cfg=cfg, chunk=4, engine="stream",
                                  decode=boom, encode=boom)
    lock, stats = threading.Lock(), Stats()
    # missing field -> client; engine exception -> internal
    r = answer(codec, {"op": "encode"}, lock, stats)
    assert r["ok"] is False and r["error_kind"] == "client"
    r = answer(codec, {"op": "decode", "codes": [1, 2]}, lock, stats)
    assert r["ok"] is False and r["error_kind"] == "internal"
    # ping/stats answer while the device lock is HELD by a decode
    with lock:
        assert answer(codec, {"op": "ping"}, lock, stats)["ok"]
        assert answer(codec, {"op": "stats"}, lock, stats)["ok"]


def test_pallas_engine_codec_matches_oneshot(server):
    """Codec(engine='pallas') — the daemon's TPU fast path — decodes
    bit-identical to the one-shot pallas engine (in-process: the
    daemon wraps exactly this Codec.decode call; the wire path is
    covered by the stream-engine socket tests above)."""
    import jax
    import jax.numpy as jnp
    from vqvae_tpu.cli.common import load_params
    from vqvae_tpu.cli.serve import Codec, handle
    from vqvae_tpu.configs import get_config
    from vqvae_tpu.infer import decode_from_codes

    cfg = get_config("tiny")
    params = load_params(server["run"], cfg)
    codec = Codec(params, cfg, chunk=4, engine="pallas")
    codec.warmup()  # CPU: greedy-only warm set must not crash
    rng = np.random.default_rng(6)
    codes = rng.integers(0, 128, 11).astype(np.int32)
    got = codec.decode(codes, speaker=1, seed=3, greedy=True)
    want = np.asarray(decode_from_codes(
        params, cfg.model, jnp.asarray(codes)[None], jnp.asarray([1]),
        jax.random.PRNGKey(3), greedy=True, impl="pallas"))[0]
    assert np.array_equal(got, want)
    r = handle(codec, {"op": "ping"})
    assert r["engine"] == "pallas"
