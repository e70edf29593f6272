from pdf_to_text_ray.functions.scalars import (
    extract_fenced_json,
    parse_float_or_zero,
    parse_int_or_zero,
    to_fixed,
)
import pytest


def test_parse_int_parity():
    # parseInt(x, 10) || 0 — main.ts:44
    assert parse_int_or_zero("42") == 42
    assert parse_int_or_zero("42.9") == 42
    assert parse_int_or_zero("  7abc") == 7
    assert parse_int_or_zero("abc") == 0
    assert parse_int_or_zero("") == 0
    assert parse_int_or_zero(None) == 0
    assert parse_int_or_zero("-3") == -3


def test_parse_float_parity():
    # parseFloat(x) || 0 — main.ts:45
    assert parse_float_or_zero("49.90") == 49.90
    assert parse_float_or_zero("49.90abc") == 49.90
    assert parse_float_or_zero("x49") == 0.0
    assert parse_float_or_zero("") == 0.0
    assert parse_float_or_zero("1e2") == 100.0
    assert parse_float_or_zero(".5") == 0.5


def test_to_fixed_js_parity():
    # Number.prototype.toFixed(2) — main.ts:51
    assert to_fixed(74.85) == "74.85"
    assert to_fixed(49.9) == "49.90"
    assert to_fixed(0) == "0.00"
    assert to_fixed(2.675) == "2.67"    # binary 2.67499... (JS gives "2.67")
    assert to_fixed(0.125) == "0.13"    # exact tie → larger n (JS "0.13")
    assert to_fixed(-0.125) == "-0.12"  # tie toward +inf (JS "-0.12")
    assert to_fixed(1.005) == "1.00"    # binary 1.00499... (JS "1.00")
    assert to_fixed(123.456) == "123.46"


def test_fenced_json():
    assert extract_fenced_json('```json\n[1, 2]\n```') == "[1, 2]"
    assert extract_fenced_json('  {"a": 1} ') == '{"a": 1}'
    with pytest.raises(ValueError):
        extract_fenced_json("not json at all")
