# -*- coding: utf-8 -*-
"""Exact ports of the reference's scalar string/time helpers.

Each function cites the reference implementation it mirrors
(``<file>:<lines>`` under ``/root/reference``). Quirks flagged
``[Q]`` are deliberate bug-for-bug reproductions: the emitted-triple
P/R >= 0.95 contract requires them.
"""

from __future__ import annotations

import datetime
import unicodedata
from hashlib import sha1 as _sha1
from typing import List, Optional, Tuple

# --------------------------------------------------------------------------
# Slugging (clean_string) — three per-converter punctuation charsets.
# LD:  ld_converter.py:114-121  (includes U+0019 and NBSP)
# PA:  pa_converter.py:101-108  (NBSP but no U+0019)
# Yle: yle_converter.py:84-91   (no '^', no U+0019, no NBSP)
# --------------------------------------------------------------------------

LD_TO_DASH = "\\/',.\":;^[]()!? #=&$%@{«°»¿=>+*\u0019\xa0"
PA_TO_DASH = "\\/',.\":;^[]()!? #=&$%@{«°»¿=>+*\xa0"
YLE_TO_DASH = "\\/',.\":;[]()!? #=&$%@{«°»¿=>+*"

# Radio channel codes, ld_converter.py:91-93.
RADIO_CHANNELS = frozenset(
    [
        "BEU", "BFM", "CHE", "D8_", "EU1", "MUV", "GA1", "EU2", "FBL",
        "FCR", "FIF", "FIT", "FMU", "FUN", "NOS", "NRJ", "RBL", "RCL",
        "RFI", "RFM", "RIR", "RMC", "RT2", "RTL", "RT9", "SKY", "SUD",
        "VIR",
    ]
)


def _slug(s: str, to_dash: str) -> str:
    """Shared slug kernel (ld_converter.py:114-121 and twins).

    Steps: NFD-normalize and drop combining marks (category ``Mn``);
    map the converter's punctuation set to ``-``; collapse runs of
    ``-`` (the reference collapses against the *pre-collapse* previous
    character, which for dash-runs is equivalent to output collapse);
    lowercase; strip leading/trailing ``-``.
    """
    decomposed = unicodedata.normalize("NFD", s)
    base_chars = [c for c in decomposed if unicodedata.category(c) != "Mn"]
    dashed = ["-" if c in to_dash else c for c in base_chars]
    out = []
    for i, c in enumerate(dashed):
        if i == 0 or c != "-" or dashed[i - 1] != "-":
            out.append(c)
    return "".join(out).lower().strip("-")


def clean_string_ld(s: str) -> str:
    return _slug(s, LD_TO_DASH)


def clean_string_pa(s: str) -> str:
    return _slug(s, PA_TO_DASH)


def clean_string_yle(s: str) -> str:
    return _slug(s, YLE_TO_DASH)


def ld_scrub(s: str) -> str:
    """[Q] Control-character scrub applied to every string cell of LD
    *program* tables only (ld_converter.py:77): U+0019 -> apostrophe,
    U+0013 -> dash, U+000B -> removed.
    """
    return s.replace("\x19", "'").replace("\x13", "-").replace("\x0b", "")


def sha1_hex(s: str) -> str:
    """sha1 hex digest of the UTF-8 bytes (ld_converter.py:176)."""
    return _sha1(s.encode()).hexdigest()


# --------------------------------------------------------------------------
# LD date/time formatting
# --------------------------------------------------------------------------

def ld_format_datetime(value: str) -> str:
    """[Q] LD datetime (ld_converter.py:138-145).

    ``YYYY-MM-DD HH:MM:SS`` -> ``YYYY-MM-DDTHH:MM:SS``. When the hour
    field exceeds 23 the reference subtracts 24 — *without* zero-padding
    the result (``24`` -> ``0``) — and increments the day into a local
    variable that is never folded back into the date string (the date
    keeps the original day). Both bugs preserved.
    """
    y, mo, d = value[:10].split("-")
    date = y + "-" + mo + "-" + d
    h, mi, s = value[11:13], value[14:16], value[17:19]
    if int(h) > 23:
        h = str(int(h) - 24)
        # reference: D = str(int(D) + 1) — computed and discarded
    return date + "T" + h + ":" + mi + ":" + s


def ld_format_duration(value) -> Optional[str]:
    """[Q] LD duration (ld_converter.py:148-154): integer seconds ->
    ``PT{hh}H{mm}M{ss}S`` with all three parts ``zfill(2)``-padded.
    Falsy input (0, '', None) -> None. Float inputs keep their repr in
    the seconds slot (pandas NaN-promoted columns), e.g. ``5.0``.
    """
    if not value:
        return None
    h = str(int(value / 3600))
    m = str(int((value % 3600) / 60))
    s = str(value % 60)
    return "PT" + h.zfill(2) + "H" + m.zfill(2) + "M" + s.zfill(2) + "S"


def ld_end_datetime(start_lex: str, seconds) -> Optional[str]:
    """LD segment end (transform('end_datetime'), ld_converter.py:160-169).

    start + duration-in-seconds -> ``%Y-%m-%dT%H:%M:%S``; returns None
    on any parse failure (the reference prints and returns None).
    """
    try:
        if not seconds:
            return None
        start = datetime.datetime.strptime(start_lex, "%Y-%m-%dT%H:%M:%S")
        return (start + datetime.timedelta(seconds=int(seconds))).strftime(
            "%Y-%m-%dT%H:%M:%S"
        )
    except Exception:
        return None


def ld_time_between(d1: str, d2: str) -> str:
    """Absolute datetime difference as HH:MM:SS (ld_converter.py:230-235).

    Both parsed ``%Y-%m-%d %H:%M:%S`` (d2 truncated to 19 chars);
    differences of >= 24h silently lose the day part.
    """
    a = datetime.datetime.strptime(d1, "%Y-%m-%d %H:%M:%S")
    b = datetime.datetime.strptime(d2[:19], "%Y-%m-%d %H:%M:%S")
    diff = max(a, b) - min(a, b)
    return (datetime.datetime.min + diff).time().strftime("%H:%M:%S")


def ld_time_after(t: str, d: str) -> Optional[str]:
    """Time + ISO duration, wrapping mod 24h (ld_converter.py:237-244).

    ``d`` is a ``PT..H..M..S`` lexical; fractional seconds are truncated
    (``PT..M5.0S`` -> ``PT..M5S``). ``d == 'None'`` -> None.
    """
    if d == str(None):
        return None
    t_dt = datetime.datetime.strptime(t, "%H:%M:%S")
    if "." in d:
        d = d.split(".")[0] + "S"
    d_dt = datetime.datetime.strptime(d, "PT%HH%MM%SS")
    delta = datetime.timedelta(
        hours=d_dt.hour, minutes=d_dt.minute, seconds=d_dt.second
    )
    return (delta + t_dt).time().strftime("%H:%M:%S")


# --------------------------------------------------------------------------
# PA date/time formatting
# --------------------------------------------------------------------------

def pa_format_duration(value: str) -> Optional[str]:
    """PA duration (pa_converter.py:112-116): ``HH:MM:SS[.ff]`` ->
    ``PT{H}H{M}M{S}S`` with the seconds slot truncated to 2 chars and
    no re-padding. Empty -> None.
    """
    if not len(value):
        return None
    h, m, s = value.split(":")
    return "PT" + h + "H" + m + "M" + s[:2] + "S"


def pa_format_datetime(value: str) -> str:
    """PA datetime (pa_converter.py:123-127): ``DD/MM/YYYY[rest]`` ->
    ``YYYY-MM-DD[T<rest>]`` — the 'T' only when chars follow the date.
    """
    d, m, y = value[:10].split("/")
    time_part = value[10:]
    return y + "-" + m + "-" + d + ("T" if time_part else "") + time_part


def pa_format_date(value: str) -> Optional[str]:
    """PA date (pa_converter.py:130-134): ``DD/MM/YYYY`` -> ``YYYY-MM-DD``;
    empty -> None."""
    if not len(value):
        return None
    d, m, y = value.split("/")
    return y + "-" + m + "-" + d


def pa_time_between(t1: str, t2: str) -> str:
    """Absolute time-of-day difference (pa_converter.py:210-214)."""
    a = datetime.datetime.strptime(t1, "%H:%M:%S")
    b = datetime.datetime.strptime(t2, "%H:%M:%S")
    diff = max(a, b) - min(a, b)
    return (datetime.datetime.min + diff).time().strftime("%H:%M:%S")


def pa_time_after(t: str, d: str) -> str:
    """Time + time-as-duration, wrapping mod 24h (pa_converter.py:217-222).
    Both args are ``HH:MM:SS`` lexicals."""
    t_dt = datetime.datetime.strptime(t, "%H:%M:%S")
    d_dt = datetime.datetime.strptime(d, "%H:%M:%S")
    delta = datetime.timedelta(
        hours=d_dt.hour, minutes=d_dt.minute, seconds=d_dt.second
    )
    return (delta + t_dt).time().strftime("%H:%M:%S")


def seconds_to_time(t: float, unit: str = "seconds") -> str:
    """[Q] ``str(timedelta)`` formatting (pa_converter.py:225-228):
    hours are NOT zero-padded (``0:01:05``) and fractional seconds show
    as 6-digit microseconds (``0:00:12.300000``)."""
    if unit == "milliseconds":
        return str(datetime.timedelta(milliseconds=t))
    return str(datetime.timedelta(seconds=t))


def time_to_seconds(t: str, unit: str = "seconds") -> int:
    """Inverse helper (pa_converter.py:231-241); parse failures -> 0."""
    import time as _time

    try:
        if t == "None":
            return 0
        if "T" in t:
            t = t.split("T")[1]
        if "day" in t:
            t = t[7:]
        x = _time.strptime(t.split(".")[0], "%H:%M:%S")
        return int(
            datetime.timedelta(
                hours=x.tm_hour, minutes=x.tm_min, seconds=x.tm_sec
            ).total_seconds()
        )
    except Exception:
        return 0


def preprocess_content(t: str) -> str:
    """[Q] ASR text normalizer (pa_converter.py:243-249): closes the gap
    after an apostrophe before a fixed 22-char vowel list (in this exact
    order), then ``'- '``->``'-'`` and ``' -'``->``' '``."""
    vowels = [
        "A", "o", "1", "Y", "O", "à", "é", "e", "É", "I", "H",
        "u", "â", "i", "y", "ô", "E", "è", "a", "U", "ê", "h",
    ]
    for v in vowels:
        t = t.replace("' " + v, "'" + v)
    t = t.replace("- ", "-")
    t = t.replace(" -", " ")
    return t


# --------------------------------------------------------------------------
# Yle date/time formatting
# --------------------------------------------------------------------------

def yle_format_date(value: str) -> str:
    """``YYYYMMDD`` -> ``YYYY-MM-DD`` (yle_converter.py:133-136)."""
    return "{}-{}-{}".format(value[:4], value[4:6], value[6:8])


def yle_format_datetime(value: str) -> str:
    """``YYYYMMDDHHMMSS`` -> ``YYYY-MM-DDTHH:MM:SS``
    (yle_converter.py:138-142)."""
    return "{}-{}-{}T{}:{}:{}".format(
        value[:4], value[4:6], value[6:8],
        value[8:10], value[10:12], value[12:14],
    )


def yle_duration_tc(value: str) -> str:
    """[Q] ``HH:MM:SS:ms`` -> ``PT{H}H{M}M{S}[.ms]S`` with the
    fractional part only when ms != '00' (yle_converter.py:108-111)."""
    h, m, s, ms = value.split(":")
    return "PT" + h + "H" + m + "M" + s + ("." + ms if ms != "00" else "") + "S"


def yle_ms_time(value: str) -> str:
    """Integer milliseconds -> ``hh:mm:ss.mmm`` with hours mod 24
    (yle_converter.py:113-123)."""
    ms = int(value)
    s = str(int((ms / 1000) % 60)).zfill(2)
    m = str(int((ms / (1000 * 60)) % 60)).zfill(2)
    h = str(int((ms / (1000 * 60 * 60)) % 24)).zfill(2)
    frac = str(int(ms % 1000)).zfill(3)
    return h + ":" + m + ":" + s + "." + frac


# --------------------------------------------------------------------------
# Credit parsing
# --------------------------------------------------------------------------

def parse_ld_credits(credits_field: str) -> List[Tuple[str, str]]:
    """[Q] LD ``Generiques`` parse (ld_converter.py:393-410).

    Pipe-separated credits of shape ``uid#Name (Role)``. The reference
    only *reassigns* ``name``/``role`` when the separators are present,
    so a malformed credit inherits the previous iteration's values
    (stale-variable carry) — reproduced here within one field's list.
    A malformed *first* credit raises, mirroring the reference's
    NameError.

    Returns (name, role) pairs; role may be '' after the ')'-strip.
    """
    out: List[Tuple[str, str]] = []
    name = None  # type: Optional[str]
    role = None  # type: Optional[str]
    for credit in credits_field.strip().split("|"):
        if credit == "":
            continue
        if "#" in credit:
            _uid, credit = credit.split("#")
        if "(" in credit:
            name, role = credit.split("(")
        if name is None or role is None:
            raise ValueError("malformed first credit: " + credit)
        out.append((name.strip(), role.strip()[:-1]))
    return out


def parse_pa_credit(credit: str) -> Tuple[str, str]:
    """[Q] PA credit parse (pa_converter.py:447-459).

    ``role`` = first 3 chars stripped; ``name`` = rest. When the name
    contains ``(`` (resp. ``-``), the reference takes
    ``name.strip('(')[0]`` — the *first character*, not first token —
    plus the first character of the remainder, yielding e.g.
    ``"Dupont (Jean)"`` -> ``"D u"``. Reproduced exactly.
    """
    role, name = credit[:3].strip(), credit[3:].strip()
    if "(" in name:
        name, complement = name.strip("(")[0], name.strip("(")[1:]
        name = name + " " + complement[0]
    if "-" in name:
        name, complement = name.strip("-")[0], name.strip("-")[1:]
        name = name + " " + complement[0]
    return role, name
