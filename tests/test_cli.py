import numpy as np
import pytest

from quadrs_tpu import args as argmod
from quadrs_tpu import pipeline as ops
from quadrs_tpu.formats import FileFormat


def _ops(tokens):
    return [c.op for c in argmod.parse(tokens) if isinstance(c, argmod.Octagon)]


def test_parse_readme_fsk_pipeline():
    got = _ops(
        "from /tmp/fsk-example.sr21M.fc32 shift 280k "
        "lowpass -power 200 -decimate 32 200k sparkfft -width 64 -stride 16".split()
    )
    frm, shift, lp, fft = got
    assert frm.details.sample_rate == 21_000_000
    assert frm.details.format is FileFormat.COMPLEX_FLOAT32
    assert shift.frequency == 280_000
    assert lp.size == 400 and lp.decimate == 32 and lp.frequency == 200_000
    assert fft.width == 64 and fft.stride == 16


def test_parse_readme_ook_pipeline():
    got = _ops(
        "from /x/cupboard-superdec.sr400.cf32 sparkfft -width 4 -stride 2 "
        "-range 0.001:0.01".split()
    )
    frm, fft = got
    assert frm.details.sample_rate == 400
    assert fft.width == 4 and fft.stride == 2
    assert fft.min == pytest.approx(0.001) and fft.max == pytest.approx(0.01)


def test_defaults():
    (lp,) = _ops("lowpass 2k".split())
    assert lp.size == 40 and lp.decimate == 8  # src/args.rs:160-171
    (fft,) = _ops(["sparkfft"])
    assert fft.width == 128 and fft.stride == 128 and fft.min is None
    (b,) = _ops("bucket -by freq 2".split())
    assert b.fft_width == 128 and b.stride == 128 and b.levels == 2
    (w,) = _ops("write out".split())
    assert w.overwrite is False and w.prefix == "out"
    (g,) = _ops("gen -cos 10 400".split())
    assert g.seconds == 1.0 and g.sample_rate == 400 and list(g.cos) == [10]


def test_negative_number_positional():
    # "-500" third char is a digit -> positional, not a flag
    (s,) = _ops("shift -500".split())
    assert s.frequency == -500


def test_gen_repeatable_cos():
    (g,) = _ops("gen -cos 10 -cos -20k -len 2 48k".split())
    assert list(g.cos) == [10, -20_000]
    assert g.seconds == 2.0
    assert g.sample_rate == 48_000


def test_duplicate_flags_rejected():
    with pytest.raises(ValueError):
        argmod.parse("lowpass -decimate 2 -decimate 4 100".split())


def test_bucket_requires_by_freq():
    with pytest.raises(ValueError):
        argmod.parse("bucket 2".split())
    with pytest.raises(ValueError):
        argmod.parse("bucket -by time 2".split())


def test_unknown_command():
    with pytest.raises(ValueError):
        argmod.parse(["frobnicate"])


def test_missing_flag_value():
    with pytest.raises(ValueError):
        argmod.parse("sparkfft -width".split())


def test_ui_eui_commands():
    cmds = argmod.parse(["ui"])
    assert isinstance(cmds[0], argmod.Ui)
    cmds = argmod.parse(["eui", "file.sr400.cf32"])
    assert isinstance(cmds[0], argmod.Eui)
    assert cmds[0].filename is not None


def test_cli_end_to_end_gen_write_sparkfft(tmp_path, monkeypatch, capsys):
    from quadrs_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    rc = main("gen -cos 20 -len 0.5 4k write tone".split())
    assert rc == 0
    assert (tmp_path / "tone.sr4000.cf32").exists()

    rc = main(f"from {tmp_path}/tone.sr4000.cf32 sparkfft -width 64".split())
    assert rc == 0
    out = capsys.readouterr().out
    assert "sparkfft sample_rate=4000" in out
    assert out.count("│") > 10


def test_cli_usage_on_empty(capsys):
    from quadrs_tpu.cli import main

    assert main([]) == 1
    out = capsys.readouterr().out
    assert "usage:" in out
    assert "cf32" in out


def test_cli_usage_on_error(capsys):
    from quadrs_tpu.cli import main

    assert main(["nonsense"]) == 1
    assert "usage:" in capsys.readouterr().out


def test_eui_slider_flags(tmp_path, monkeypatch):
    import numpy as np

    from quadrs_tpu import args as argmod
    from quadrs_tpu.cli import main

    cmds = argmod.parse("eui -start 10 -end 90 -fft 64 file.sr400.cf32".split())
    assert isinstance(cmds[0], argmod.Eui)
    assert cmds[0].start_pct == 10.0 and cmds[0].end_pct == 90.0
    assert cmds[0].fft_width == 64

    # end to end with a tiny capture
    monkeypatch.chdir(tmp_path)
    rc = main("gen -cos 50 -len 20 4k write tone".split())
    assert rc == 0
    rc = main("eui -start 0 -end 50 -fft 32 tone.sr4000.cf32".split())
    assert rc == 0
    from PIL import Image

    img = np.asarray(Image.open(tmp_path / "eui.png"))
    assert img.shape[1] == 32


def test_si_suffixed_negative_is_a_flag_quirk():
    """'-5k' has a non-digit third char so the reference reads it as a
    flag named '5k' needing a value (src/args.rs:422-426) — preserved."""
    import pytest

    with pytest.raises(ValueError, match="requires an argument"):
        argmod.parse("shift -5k".split())
    # but a plain negative number is a positional
    (s,) = _ops("shift -5000".split())
    assert s.frequency == -5000


def test_two_char_minus_token_is_a_flag():
    """'-5' has no third char, so it's treated as a flag (quirk kept)."""
    import pytest

    with pytest.raises(ValueError):
        argmod.parse("shift -5".split())


def test_empty_token_ends_flag_scan():
    # an empty string token stops flag collection (src/args.rs:413-415)
    (s,) = _ops(["sparkfft", "-width", "64"])
    assert s.width == 64


def test_ui_flags(tmp_path, monkeypatch):
    cmds = argmod.parse("ui -fft 16 -stretch 2 -stride 8".split())
    assert isinstance(cmds[0], argmod.Ui)
    assert (cmds[0].fft_width, cmds[0].stretch, cmds[0].stride) == (16, 2, 8)

    # default stride is 4 so the file render isn't all-black (the
    # reference GUI starts at 1 but has a button to change it)
    (u,) = argmod.parse(["ui"])
    assert u.stride == 4

    import numpy as np
    from PIL import Image

    from quadrs_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    assert main("gen -cos 500 -len 2 48k write tone".split()) == 0
    assert main("from tone.sr48000.cf32 ui -fft 16".split()) == 0
    img = np.asarray(Image.open(tmp_path / "ui.png"))
    assert img.sum() > 0  # non-black output by default


def test_from_missing_file_clean_error(capsys):
    from quadrs_tpu.cli import main

    rc = main("from /nonexistent/x.sr400.cf32 sparkfft".split())
    assert rc == 1
    assert "Error:" in capsys.readouterr().err


def test_full_pipeline_roundtrip_vs_oracle(tmp_path, monkeypatch, capsys):
    """Deep integration: gen -> shift -> lowpass -> write, re-from the
    written file, bucket — every stage chained through the CLI, checked
    against the sequential oracle end to end."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from oracle import (
        OracleArray,
        OracleGen,
        OracleLowPass,
        OracleShift,
        oracle_freq_levels,
    )

    from quadrs_tpu.cli import main
    from quadrs_tpu.formats import FileFormat, decode_bytes

    monkeypatch.chdir(tmp_path)
    rc = main(
        "gen -cos 3k -cos -9k -len 1 48k shift 2k "
        "lowpass -power 40 -decimate 4 10k write chain".split()
    )
    assert rc == 0
    raw = np.fromfile(tmp_path / "chain.sr12000.cf32", dtype=np.uint8)
    got = decode_bytes(raw, FileFormat.COMPLEX_FLOAT32)

    # oracle: the same chained pulls with the writer's 0x1000 chunks
    chain = OracleLowPass(
        OracleShift(OracleGen([3000, -9000], 48_000, 1.0), 2000, 48_000),
        10_000,
        4,
        80,
    )
    want = []
    off = 0
    while off < chain.length:
        block = chain.read_at(off, 0x1000)
        assert len(block) > 0
        want.append(block)
        off += len(block)
    want = np.concatenate(want)
    assert len(got) == len(want)
    np.testing.assert_allclose(got, want, atol=3e-5 * np.abs(want).max())

    # and bucket over the written file matches the oracle's discriminator
    rc = main(f"from {tmp_path}/chain.sr12000.cf32 bucket -by freq -width 32 2".split())
    assert rc == 0
    digits = capsys.readouterr().out.strip().splitlines()[-1]
    want_syms = oracle_freq_levels(OracleArray(want, 12_000), 32, 32)
    assert digits == "".join(map(str, want_syms))


def test_parser_fuzz_never_crashes():
    """Random token soup must either parse or raise ValueError — no
    other exception type escapes the grammar."""
    import numpy as np

    rng = np.random.default_rng(99)
    vocab = [
        "from", "shift", "lowpass", "sparkfft", "bucket", "write", "gen",
        "ui", "eui", "-sr", "-format", "-width", "-stride", "-range",
        "-power", "-decimate", "-cos", "-len", "-by", "-overwrite",
        "freq", "cf32", "x.sr400.cf32", "100", "-5", "1k", "21M", "0.5",
        "0.001:0.01", "yes", "", "-", ":", "-0x", "nan",
    ]
    for _ in range(300):
        n = int(rng.integers(0, 8))
        tokens = [vocab[int(rng.integers(0, len(vocab)))] for _ in range(n)]
        try:
            argmod.parse(tokens)
        except ValueError:
            pass  # the only acceptable failure mode
