import pytest

from quadrs_tpu.formats import FileFormat
from quadrs_tpu.utils import (
    guess_details,
    guess_format_from_name,
    parse_bool,
    parse_si_float,
    parse_si_int,
    parse_si_uint,
)


def test_si_uint_reference_cases():
    # mirrors the reference's own unit test (src/args.rs:456-466)
    assert parse_si_uint("123") == 123
    assert parse_si_uint("1k") == 1_000
    assert parse_si_uint("47k") == 47_000
    assert parse_si_uint("0M") == 0


def test_si_suffixes():
    assert parse_si_uint("2G") == 2_000_000_000
    assert parse_si_int("-5k") == -5_000
    assert parse_si_int("280k") == 280_000
    assert parse_si_float("1.5M") == 1_500_000.0
    assert parse_si_float("0.25") == 0.25


def test_si_rejects_garbage():
    for bad in ["", "k", "1.5", "twelve", "1 k", "1_0"]:
        with pytest.raises(ValueError):
            parse_si_uint(bad)
    with pytest.raises(ValueError):
        parse_si_uint("-4")


def test_parse_bool():
    assert parse_bool("true") and parse_bool("yes") and parse_bool("y")
    assert not (parse_bool("false") or parse_bool("no") or parse_bool("n"))
    with pytest.raises(ValueError):
        parse_bool("maybe")


def test_sniff_sr_token():
    sr, fmt = guess_format_from_name("capture.sr32k.cf32")
    assert sr == "32k"
    assert fmt is FileFormat.COMPLEX_FLOAT32


def test_sniff_gqrx():
    sr, fmt = guess_format_from_name("gqrx_20180126_111922_868000000_8000000_fc.raw")
    assert sr == "8000000"
    assert fmt is FileFormat.COMPLEX_FLOAT32


def test_sniff_rtl433():
    sr, fmt = guess_format_from_name("g001_433.92M_250k.cu8")
    assert sr == "250k"
    assert fmt is FileFormat.COMPLEX_UINT8


def test_sniff_extensions():
    cases = {
        "x.fc32": FileFormat.COMPLEX_FLOAT32,
        "x.cs8": FileFormat.COMPLEX_INT8,
        "x.sc8": FileFormat.COMPLEX_INT8,
        "x.c8": FileFormat.COMPLEX_INT8,
        "x.cu8": FileFormat.COMPLEX_UINT8,
        "x.su8": FileFormat.COMPLEX_UINT8,
        "x.cs16": FileFormat.COMPLEX_INT16,
        "x.sc16": FileFormat.COMPLEX_INT16,
        "x.c16": FileFormat.COMPLEX_INT16,
    }
    for name, want in cases.items():
        _, fmt = guess_format_from_name(name)
        assert fmt is want, name


def test_guess_details_overrides():
    details = guess_details("mystery.bin", "2M", "cu8")
    assert details.sample_rate == 2_000_000
    assert details.format is FileFormat.COMPLEX_UINT8

    details = guess_details("fsk-example.sr21M.fc32")
    assert details.sample_rate == 21_000_000
    assert details.format is FileFormat.COMPLEX_FLOAT32


def test_guess_details_errors():
    with pytest.raises(ValueError):
        guess_details("noformat.sr21M")
    with pytest.raises(ValueError):
        guess_details("norate.cf32")
    with pytest.raises(ValueError):
        guess_details("x.cf32", "1M", "nonsense")
