"""CLI tests (mirroring zk-lisp-cli/tests/cli.rs)."""

import json
import os

import pytest

from zklisp_tpu import cli

HELLO = "/root/reference/examples/hello-zk.zlisp"


def run_cli(capsys, argv):
    rc = cli.main(argv)
    out = capsys.readouterr().out.strip()
    return rc, out


def test_run_happy_path_json(capsys):
    rc, out = run_cli(capsys, [
        "run", HELLO, "--arg", "u64:2", "--arg", "u64:5",
        "--secret", "u64:3", "--json"])
    assert rc == 0
    data = json.loads(out)
    assert data["ok"] and data["result"] == "1"
    assert data["trace_len"] == 512


def test_run_missing_args_fails(capsys):
    rc, out = run_cli(capsys, ["run", HELLO, "--json"])
    assert rc == 1
    assert not json.loads(out)["ok"]


def test_run_schema_type_mismatch(capsys):
    rc, out = run_cli(capsys, [
        "run", HELLO, "--arg", "bytes32:0x01", "--arg", "u64:5", "--json"])
    assert rc == 1


def test_typed_arg_parsing():
    a = cli.parse_vm_arg("u64:7")
    assert a.kind == "u64" and a.value == 7
    a = cli.parse_vm_arg("u128:340282366920938463463374607431768211455")
    assert a.kind == "u128"
    a = cli.parse_vm_arg("bytes32:0x0102")
    assert a.kind == "bytes32" and a.value[0] == 1 and a.value[2] == 0
    vmargs, u64s = cli.parse_public_args(["u64:7", "u128:9"])
    assert u64s == [7, 9]
    with pytest.raises(cli.CliError):
        cli.parse_public_args([f"u128:{1 << 100}"])


def test_merkle_root_flag_prove_verify(capsys, tmp_path):
    """--merkle-root (beyond the reference CLI, which has no flag and
    cannot prove multi-level merkle programs): compute the expected
    root host-side, prove with it bound into the PI, verify with the
    same flag; a wrong root must fail the pi_digest identity check."""
    from zklisp_tpu.compiler import compile_entry
    from zklisp_tpu.crypto.poseidon import merkle_root_from_path

    src = tmp_path / "mk.zlisp"
    src.write_text(
        "(def (main leaf) (merkle-verify leaf ((0 2) (1 3))))")
    prog = compile_entry(src.read_text(), [1])
    root = merkle_root_from_path(prog.program_id, 1, [(0, 2), (1, 3)])

    out_path = str(tmp_path / "mk.bin")
    rc, out = run_cli(capsys, [
        "prove", str(src), "--arg", "u64:1", "--merkle-root", str(root),
        "--queries", "8", "--blowup", "8", "--grind", "0",
        "--security-bits", "0", "--out", out_path, "--json"])
    assert rc == 0 and json.loads(out)["ok"]

    rc, out = run_cli(capsys, [
        "verify", out_path, str(src), "--arg", "u64:1",
        "--merkle-root", str(root), "--security-bits", "0", "--json"])
    assert rc == 0 and json.loads(out)["ok"]

    rc, out = run_cli(capsys, [
        "verify", out_path, str(src), "--arg", "u64:1",
        "--merkle-root", str((root + 1)), "--security-bits", "0",
        "--json"])
    assert rc == 1
    assert "pi_digest" in json.loads(out)["error"]


def test_merkle_root_flag_parsing():
    assert cli.parse_merkle_root(None) is None
    assert cli.parse_merkle_root("5") == \
        (5).to_bytes(16, "little") + b"\x00" * 16
    raw = "0x" + "ab" * 32
    assert cli.parse_merkle_root(raw) == bytes.fromhex("ab" * 32)
    with pytest.raises(cli.CliError):
        cli.parse_merkle_root("0x0102")
    with pytest.raises(cli.CliError):
        cli.parse_merkle_root("zz")


def test_preflight_catches_bad_assert(capsys, tmp_path):
    src = tmp_path / "bad.zlisp"
    src.write_text(
        "(def (main x) (begin (assert (= x (secret-arg 0))) 1))")
    rc, out = run_cli(capsys, [
        "run", str(src), "--arg", "u64:5", "--secret", "u64:6",
        "--preflight", "console", "--json"])
    assert rc == 1  # assert 5 == 6 fails constraints


def test_repl_session(capsys):
    from zklisp_tpu.repl import ReplSession
    s = ReplSession()
    import io
    out = io.StringIO()
    s.handle("(def (sq x) (* x x))", out)
    s.handle("(sq 7)", out)
    text = out.getvalue()
    assert "ok" in text and "49" in text
    s.handle(":cost (sq 9)", out)
    text = out.getvalue()
    assert "cost: rows=" in text and "metrics: peak_live=" in text


def test_repl_docs_save_reset(tmp_path):
    """repl.rs :docs/:save/:reset parity (repl.rs:224-323, 826)."""
    import io

    from zklisp_tpu.repl import ReplSession
    s = ReplSession()
    out = io.StringIO()
    s.handle(";; squares x", out)
    s.handle("(def (sq x) (* x x))", out)
    s.handle(":docs", out)
    text = out.getvalue()
    assert "fn: sq" in text and "squares x" in text
    path = tmp_path / "sess"
    s.handle(f":save {path}", out)
    saved = (tmp_path / "sess.zlisp").read_text()
    assert "(def (sq x)" in saved
    s.handle(":reset", out)
    out2 = io.StringIO()
    s.handle(":docs", out2)
    assert "(none)" in out2.getvalue()


def test_repl_prove_verify_roundtrip():
    """:prove wraps the expression into a main entry (repl.rs:324-460)."""
    import io

    from zklisp_tpu.repl import ReplSession
    s = ReplSession()
    out = io.StringIO()
    s.handle("(def (sq x) (* x x))", out)
    s.handle(":prove (sq 4)", out)
    text = out.getvalue()
    assert "cost: rows=" in text and "proved in" in text
    s.handle(":verify", out)
    assert "verified OK" in out.getvalue()


def test_repl_cost_op_classes():
    """repl.rs compute_cost parity: per-op-class counts (repl.rs:944)."""
    import io

    from zklisp_tpu.repl import ReplSession
    s = ReplSession()
    out = io.StringIO()
    s.handle(":cost (hash2 3 4)", out)
    text = out.getvalue()
    assert "sponge_absorb_calls=1" in text
    assert "sponge_absorb_elems=2" in text
    assert "squeeze_calls=1" in text
    assert "merkle_steps=0" in text
