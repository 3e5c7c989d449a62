# -*- coding: utf-8 -*-
"""Golden + property tests for the byte-identical textkit layer.

Golden expectations were derived by hand-executing the reference
helpers (/root/reference/{ld,pa,yle}_converter.py); a few tests also
re-extract literals from the reference source to guard transcription.
"""

import ast
import re

import pytest
from hypothesis import given, strategies as st

from rdf_converter_spark.textkit import (
    LD_TO_DASH,
    PA_TO_DASH,
    YLE_TO_DASH,
    RADIO_CHANNELS,
    clean_string_ld,
    clean_string_pa,
    clean_string_yle,
    ld_scrub,
    ld_format_datetime,
    ld_format_duration,
    ld_end_datetime,
    ld_time_between,
    ld_time_after,
    pa_format_duration,
    pa_format_datetime,
    pa_format_date,
    pa_time_between,
    pa_time_after,
    seconds_to_time,
    preprocess_content,
    yle_format_date,
    yle_format_datetime,
    yle_duration_tc,
    yle_ms_time,
    parse_ld_credits,
    parse_pa_credit,
    sha1_hex,
)

REF = "/root/reference"


def _ref_literal(path, pattern):
    for line in open(path, encoding="utf-8"):
        m = re.match(pattern, line)
        if m:
            return ast.literal_eval(m.group(1))
    raise AssertionError("literal not found in " + path)


def test_to_dash_charsets_match_reference_source():
    pat = r"\s*to_dash = ('.*?')\s*(#.*)?$"
    assert _ref_literal(f"{REF}/ld_converter.py", pat) == LD_TO_DASH
    assert _ref_literal(f"{REF}/pa_converter.py", pat) == PA_TO_DASH
    assert _ref_literal(f"{REF}/yle_converter.py", pat) == YLE_TO_DASH


def test_vowel_list_matches_reference_source():
    src = open(f"{REF}/pa_converter.py", encoding="utf-8").read()
    m = re.search(r"vowels = (\[.*?\])", src)
    ref_vowels = ast.literal_eval(m.group(1))
    # re-derive from our function behaviour: each vowel closes the gap
    for v in ref_vowels:
        assert preprocess_content("l' " + v) == "l'" + v
    # a character outside the list does not
    assert preprocess_content("l' z") == "l' z"


def test_radio_channels_match_reference_source():
    src = open(f"{REF}/ld_converter.py", encoding="utf-8").read()
    m = re.search(r"radio_channels = set\((\[[^\]]*\])\)", src)
    assert frozenset(ast.literal_eval(m.group(1))) == RADIO_CHANNELS


class TestCleanString:
    def test_accents_stripped(self):
        assert clean_string_ld("Télé Matin") == "tele-matin"
        assert clean_string_pa("Médiathèque") == "mediatheque"
        assert clean_string_yle("Pääkaupunki") == "paakaupunki"

    def test_punctuation_to_dash_and_collapse(self):
        assert clean_string_ld("a, b: c") == "a-b-c"
        assert clean_string_ld("a,,b") == "a-b"
        assert clean_string_ld("(hello)") == "hello"

    def test_charset_differences(self):
        # NBSP is dashed in LD/PA but kept (lowercased) in Yle
        assert clean_string_ld("a\xa0b") == "a-b"
        assert clean_string_pa("a\xa0b") == "a-b"
        assert clean_string_yle("a\xa0b") == "a\xa0b"
        # '^' dashed in LD/PA only
        assert clean_string_ld("a^b") == "a-b"
        assert clean_string_yle("a^b") == "a^b"
        # U+0019 dashed in LD only
        assert clean_string_ld("a\x19b") == "a-b"
        assert clean_string_pa("a\x19b") == "a\x19b"

    def test_strip_and_lower(self):
        assert clean_string_ld("  Le Monde  ") == "le-monde"
        assert clean_string_ld("---") == ""

    @given(st.text(max_size=60))
    def test_idempotent(self, s):
        once = clean_string_ld(s)
        assert clean_string_ld(once) == once

    @given(st.text(max_size=60))
    def test_no_double_dash_in_output(self, s):
        assert "--" not in clean_string_ld(s)


class TestLdScrub:
    def test_replacements(self):
        assert ld_scrub("a\x19b\x13c\x0bd") == "a'b-cd"


class TestLdDatetime:
    def test_normal(self):
        assert ld_format_datetime("2019-05-14 20:15:00") == "2019-05-14T20:15:00"

    def test_hour_rollover_bug(self):
        # hour 24 -> '0' (unpadded) and the day is NOT incremented
        assert ld_format_datetime("2019-05-14 24:15:00") == "2019-05-14T0:15:00"
        assert ld_format_datetime("2019-12-31 25:01:02") == "2019-12-31T1:01:02"


class TestLdDuration:
    def test_int_padding(self):
        assert ld_format_duration(3725) == "PT01H02M05S"
        assert ld_format_duration(59) == "PT00H00M59S"
        assert ld_format_duration(3600) == "PT01H00M00S"

    def test_falsy(self):
        assert ld_format_duration(0) is None
        assert ld_format_duration("") is None

    def test_float_quirk(self):
        # NaN-promoted pandas column: seconds slot keeps the float repr
        assert ld_format_duration(3725.0) == "PT01H02M5.0S"


def test_ld_end_datetime():
    assert ld_end_datetime("2019-05-14T20:15:00", 3600) == "2019-05-14T21:15:00"
    assert ld_end_datetime("2019-05-14T23:30:00", 3600) == "2019-05-15T00:30:00"
    assert ld_end_datetime("None", 10) is None
    assert ld_end_datetime("2019-05-14T20:15:00", 0) is None


def test_ld_time_between():
    # d2 longer than 19 chars is truncated before parsing
    assert ld_time_between("2014-05-01 05:32:32", "2014-05-01 05:33:17+01:00") == "00:00:45"
    assert ld_time_between("2014-05-01 06:00:00", "2014-05-01 05:00:00") == "01:00:00"
    # >=24h difference silently drops the day part
    assert ld_time_between("2014-05-01 05:00:00", "2014-05-03 06:00:00") == "01:00:00"


def test_ld_time_after():
    assert ld_time_after("01:00:00", "PT01H02M05S") == "02:02:05"
    assert ld_time_after("23:30:00", "PT01H00M00S") == "00:30:00"  # wraps
    assert ld_time_after("01:00:00", "PT01H02M5.0S") == "02:02:05"  # frac truncated
    assert ld_time_after("01:00:00", "None") is None


class TestPaFormats:
    def test_duration(self):
        assert pa_format_duration("01:02:05") == "PT01H02M05S"
        assert pa_format_duration("01:02:05.79") == "PT01H02M05S"
        assert pa_format_duration("1:2:3") == "PT1H2M3S"
        assert pa_format_duration("") is None

    def test_datetime(self):
        assert pa_format_datetime("14/05/2019 20:15:00") == "2019-05-14T 20:15:00"
        assert pa_format_datetime("14/05/2019") == "2019-05-14"
        # date+time concatenation as done at pa_converter.py:526
        assert pa_format_datetime("14/05/2019" + "20:15:00") == "2019-05-14T20:15:00"

    def test_date(self):
        assert pa_format_date("14/05/2019") == "2019-05-14"
        assert pa_format_date("") is None

    def test_time_between(self):
        assert pa_time_between("20:00:00", "20:05:30") == "00:05:30"
        assert pa_time_between("21:00:00", "20:00:00") == "01:00:00"

    def test_time_after(self):
        assert pa_time_after("00:05:30", "00:10:00") == "00:15:30"
        assert pa_time_after("23:59:00", "00:02:00") == "00:01:00"


def test_seconds_to_time_formatting():
    assert seconds_to_time(65.0) == "0:01:05"          # hours unpadded
    assert seconds_to_time(12.3) == "0:00:12.300000"   # microsecond repr
    assert seconds_to_time(3600.0) == "1:00:00"


def test_preprocess_content():
    assert preprocess_content("l' avion") == "l'avion"
    assert preprocess_content("c' était") == "c'était"
    assert preprocess_content("le- mot") == "le-mot"
    assert preprocess_content("le -mot") == "le mot"


class TestYleFormats:
    def test_date(self):
        assert yle_format_date("20190514") == "2019-05-14"

    def test_datetime(self):
        assert yle_format_datetime("20190514201500") == "2019-05-14T20:15:00"

    def test_duration_tc(self):
        assert yle_duration_tc("01:02:03:00") == "PT01H02M03S"
        assert yle_duration_tc("01:02:03:12") == "PT01H02M03.12S"

    def test_ms_time(self):
        assert yle_ms_time("3725123") == "01:02:05.123"
        assert yle_ms_time("0") == "00:00:00.000"
        # hours wrap mod 24
        assert yle_ms_time(str(25 * 3600 * 1000)) == "01:00:00.000"


class TestCredits:
    def test_ld_well_formed(self):
        assert parse_ld_credits("123#Jean Dupont (PRE)") == [("Jean Dupont", "PRE")]
        assert parse_ld_credits("1#A B (PRE)|2#C D (PRO)") == [
            ("A B", "PRE"),
            ("C D", "PRO"),
        ]

    def test_ld_stale_carry(self):
        # second credit lacks '(' -> inherits previous name/role
        assert parse_ld_credits("1#A B (PRE)|2#xxx") == [
            ("A B", "PRE"),
            ("A B", "PRE"),
        ]

    def test_ld_first_malformed_raises(self):
        with pytest.raises(ValueError):
            parse_ld_credits("no-separators-here")

    def test_pa_simple(self):
        assert parse_pa_credit("PRE Jean Dupont") == ("PRE", "Jean Dupont")

    def test_pa_paren_slicing_quirk(self):
        # "Dupont (Jean)": strip('(') is a no-op, [0] takes 'D',
        # remainder's first char is 'u' -> "D u"
        assert parse_pa_credit("PRE Dupont (Jean)") == ("PRE", "D u")

    def test_pa_dash_slicing_quirk(self):
        assert parse_pa_credit("PRE Jean-Luc") == ("PRE", "J e")


def test_sha1_hex():
    assert sha1_hex("abc") == "a9993e364706816aba3e25717850c26c9cd0d89d"
