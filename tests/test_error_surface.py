"""Error-surface conformance sweep: command lines the reference parser
rejects must be rejected here too (all parse failures surface as
ValueError), and every deliberate acceptance divergence is pinned
explicitly and documented in PARITY.md.

Reference rejection sites: ``src/args.rs:19-45`` (unrecognised command),
``:404-445`` (flag argument rules), ``:447-454`` (duplicates),
``:309-315`` (ui rejects all flags), ``:57,141,173,211,245,263,294``
(per-command invalid-flags ensures), ``:354-390`` (Rust-strict number /
bool parsing).
"""

import pytest

from quadrs_tpu.args import Eui, Ui, parse

# Every entry is (argv, why-the-reference-rejects-it).
REJECTED = [
    # -- command dispatch (src/args.rs:38) ---------------------------------
    (["nonsense"], "unrecognised command"),
    ([""], "empty token is an unrecognised command"),
    (["FROM", "x.sr8k.cf32"], "commands are case-sensitive"),
    # flags-after-positional: the positional ends the flag scan, so the
    # stray flag is parsed as the next command
    (["lowpass", "200k", "-decimate", "8"], "'-decimate' unrecognised command"),
    # -- flag argument rules (src/args.rs:404-445) -------------------------
    (["from", "-sr"], "-sr requires an argument"),
    (["lowpass", "-power", "", "200k"], "flag value may not be empty"),
    (["shift", "-", "100"], "'-' is a flag named '', shift takes no flags"),
    # the reference's quirk: third char of '-5k' is not a digit, so it is
    # a flag named '5k' — which then has no argument
    (["shift", "-5k"], "-5k mis-reads as a flag (reference quirk, kept)"),
    # -- duplicates (src/args.rs:447-454) ----------------------------------
    (["from", "-sr", "8k", "-sr", "9k", "f.cf32"], "duplicate -sr"),
    (["sparkfft", "-width", "4", "-width", "4"], "duplicate -width"),
    (["eui", "-start", "10", "-start", "20"], "eui still rejects duplicates"),
    (["gen", "-cos", "1", "-len", "1", "-len", "2", "8k"], "len exactly once"),
    # -- per-command invalid flags -----------------------------------------
    (["from", "-bogus", "x", "f.sr8k.cf32"], "invalid flags for from"),
    (["shift", "-width", "4", "100"], "shift has no named arguments"),
    (["lowpass", "-nope", "1", "200k"], "invalid flags for lowpass"),
    (["sparkfft", "-nope", "1"], "invalid flags for sparkfft"),
    (["bucket", "-nope", "1", "-by", "freq", "2"], "invalid flags for bucket"),
    (["write", "-nope", "1", "out"], "invalid flags for write"),
    (["gen", "-cos", "1", "-nope", "1", "8k"], "invalid flags for gen"),
    (["ui", "-bogus", "1"], "invalid flags for ui"),
    # -- missing positionals ------------------------------------------------
    (["from"], "from requires a filename"),
    (["shift"], "shift requires a frequency"),
    (["lowpass"], "lowpass requires a frequency"),
    (["bucket", "-by", "freq"], "bucket requires a level count"),
    (["write"], "write requires a prefix"),
    (["gen", "-cos", "100"], "gen requires a sample rate"),
    # -- from sniffing (src/args.rs:65-98) ----------------------------------
    (["from", "-format", "wav", "x.sr8k"], "unrecognised extension"),
    (["from", "noformat.sr8k"], "cannot guess format"),
    (["from", "norate.cf32"], "cannot guess sample rate"),
    # -- bucket -by (src/args.rs:240-243) ------------------------------------
    (["bucket", "2"], "must bucket -by freq"),
    (["bucket", "-by", "time", "2"], "must bucket -by freq"),
    (["bucket", "-by", "freq", "2k"], "levels take no SI suffix"),
    # -- gen (src/args.rs:277-291) --------------------------------------------
    (["gen", "8k"], "gen requires at least one -cos"),
    (["gen", "-cos", "1.5", "8k"], "cos frequencies are integers"),
    (["gen", "-len", "abc", "-cos", "1", "8k"], "bad len float"),
    # -- Rust-strict number parsing (src/args.rs:354-379) ---------------------
    (["shift", "abc"], "not a number"),
    (["shift", "1.5"], "i64 parse rejects floats"),
    (["shift", "1_000"], "i64 parse rejects underscores"),
    (["shift", "0x10"], "i64 parse rejects hex"),
    (["shift", "47K"], "only k/M/G are suffixes, K is not"),
    (["lowpass", "-decimate", "-8", "200k"], "u64 parse rejects signs"),
    (["lowpass", "-decimate", "+8", "200k"], "u64 parse rejects plus too"),
    (["sparkfft", "-range", "0.1"], "range must contain ':'"),
    (["sparkfft", "-range", "a:b"], "range bounds must be floats"),
    # -- booleans (src/args.rs:381-390) ----------------------------------------
    (["write", "-overwrite", "maybe", "out"], "bad bool"),
    (["write", "-overwrite", "TRUE", "out"], "Rust bool parse is case-sensitive"),
    (["write", "-overwrite", "1", "out"], "numeric bools rejected"),
    (["write", "-overwrite", "Yes", "out"], "yes/y/no/n are lowercase only"),
]


@pytest.mark.parametrize(
    "argv", [r[0] for r in REJECTED], ids=[" ".join(r[0]) or "<empty>" for r in REJECTED]
)
def test_reference_rejections_also_rejected(argv):
    with pytest.raises(ValueError):
        parse(argv)


# -- reference-accepted lines that must keep parsing -------------------------

ACCEPTED = [
    ["shift", "-500"],  # negative-number positional (third char digit)
    ["shift", "-500k"],  # '-500k': third char '0' is a digit -> positional
    ["gen", "-cos", "100", "-cos", "200", "8k"],  # repeatable -cos
    ["write", "-overwrite", "y", "out"],
    ["write", "-overwrite", "no", "out"],
    ["sparkfft", "-range", "-0.5:1.0"],  # negative range bound
    ["gen", "-len", "inf", "-cos", "1", "8k"],  # Rust f64 parses inf
    ["eui"],  # filename optional
]


@pytest.mark.parametrize("argv", ACCEPTED, ids=[" ".join(a) for a in ACCEPTED])
def test_reference_accepted_lines_parse(argv):
    parse(argv)


# -- deliberate divergences (documented in PARITY.md) -------------------------


def test_divergence_ui_accepts_render_knobs():
    """The reference rejects *any* ui flag (src/args.rs:309-315) because
    the GUI window has interactive buttons; the PNG renderer exposes the
    button state as flags (plus -frames for the parameter-sweep render).
    Everything else is still rejected."""
    (cmd,) = parse(["ui", "-fft", "16", "-stretch", "2", "-stride", "8", "-frames", "3"])
    assert cmd == Ui(fft_width=16, stretch=2, stride=8, frames=3)
    with pytest.raises(ValueError):
        parse(["ui", "-width", "16"])  # only the render knobs are legal


def test_divergence_eui_interprets_slider_flags():
    """The reference's eui drops all flags silently (src/args.rs:318-326,
    `_map` unused); here -start/-end/-fft/-frames set the slider state
    and any other flag is still silently dropped (matching the
    reference)."""
    (cmd,) = parse(["eui", "-start", "10", "-end", "20", "-fft", "1024", "f.cf32"])
    assert isinstance(cmd, Eui)
    assert (cmd.start_pct, cmd.end_pct, cmd.fft_width) == (10.0, 20.0, 1024)
    (dropped,) = parse(["eui", "-whatever", "1"])  # silently dropped, like ref
    assert dropped == Eui(filename=None)
