"""Natural-language date parsing for parse-as-date.

A small relative-date grammar covering the shapes the reference exercises
through natty (ref: parser/ParseDate.java:103-112, ParseDateTest
``testDateParser``: "now", "today", "12/10/2016", "september 7th 2016",
"1485800109") plus the common relative forms natty documents
("yesterday", "tomorrow", "next tuesday", "3 days ago", "in 2 weeks",
"this tuesday", "the day before yesterday", "tomorrow at 3pm",
"today at noon", "a week ago", "october 2006", "the 3rd of next month",
"the first monday of june", "last friday of march 2024", bare clock
times like "noon" / "3pm" / "10:30", fuzzy prefixes "around"/"about"
(decoration, stripped), ranges "between march 3 and march 5" /
"from monday to friday" (both endpoints must parse; resolves to the
START — a documented local convention, since a directive emits one
timestamp per row where natty returns the whole date group),
relative-to-anchor composition "a week from tomorrow" / "2 days after
next friday" / "3 days before christmas" (the anchor recurses through
the whole grammar), period edges "end of the month" / "beginning of
next year" / "start of last week" (start = first day 00:00, end =
LAST day 00:00; ISO Monday weeks), and natty's US holiday set
(christmas/eve, new year's day/eve, halloween, valentine's,
independence day / fourth of july, floating thanksgiving) with
next/last/this, explicit years, and the nearest-upcoming bare form.
Fresh implementation against natty's published behavior — not a port.

Pure Python, no Spark imports: the directive wraps :func:`parse_natural`
in an Arrow-batched pandas UDF; tests call it directly.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone as _tz
from zoneinfo import ZoneInfo

_MONTHS = {
    "jan": 1, "january": 1, "feb": 2, "february": 2, "mar": 3, "march": 3,
    "apr": 4, "april": 4, "may": 5, "jun": 6, "june": 6, "jul": 7, "july": 7,
    "aug": 8, "august": 8, "sep": 9, "sept": 9, "september": 9,
    "oct": 10, "october": 10, "nov": 11, "november": 11,
    "dec": 12, "december": 12,
}
_WEEKDAYS = {
    "monday": 0, "mon": 0, "tuesday": 1, "tue": 1, "tues": 1,
    "wednesday": 2, "wed": 2, "thursday": 3, "thu": 3, "thurs": 3,
    "friday": 4, "fri": 4, "saturday": 5, "sat": 5, "sunday": 6, "sun": 6,
}
_UNITS = {
    "minute": "minutes", "minutes": "minutes", "min": "minutes",
    "hour": "hours", "hours": "hours",
    "day": "days", "days": "days",
    "week": "weeks", "weeks": "weeks",
    "fortnight": "fortnights", "fortnights": "fortnights",
    "month": "months", "months": "months",
    "year": "years", "years": "years",
}

_ORD = r"(?:st|nd|rd|th)?"
_MON = "|".join(sorted(_MONTHS, key=len, reverse=True))
_WD = "|".join(sorted(_WEEKDAYS, key=len, reverse=True))
_TIME = r"(?:\s+(?:at\s+)?(\d{1,2}):(\d{2})(?::(\d{2}))?\s*(am|pm)?)?"

# optional leading weekday ("fri jan 3", "friday, january 3 2020"): natty
# treats the weekday token as decoration — the month/day/year decide the
# date, the weekday is not validated against it
_WDP = rf"(?:(?:{_WD})\.?,?\s+)?"
_RE_MDY = re.compile(
    rf"^{_WDP}({_MON})\.?\s+(\d{{1,2}}){_ORD}(?:\s*,?\s*(\d{{4}}))?{_TIME}$", re.I)
_RE_DMY = re.compile(
    rf"^{_WDP}(?:the\s+)?(\d{{1,2}}){_ORD}\s+(?:of\s+)?({_MON})\.?(?:\s*,?\s*(\d{{4}}))?{_TIME}$",
    re.I)
# optional trailing clock time ("next friday at 3pm", "last monday
# 10:30", "this tuesday at noon") — natty composes next/last/this
# phrases with times freely; the clause is the relday branch's richer
# one (bare hour + am/pm, noon/midnight), not _TIME's h:mm-only form
_TIMEX = (
    r"(?:\s+(?:at\s+)?(?:(noon|midnight)|(\d{1,2})(?::(\d{2}))?(?::(\d{2}))?\s*(am|pm)?))?"
)
_RE_NEXT_LAST = re.compile(rf"^(next|last|this)\s+({_WD}|week|month|year){_TIMEX}$", re.I)
_RE_AGO = re.compile(r"^(\d+|an?)\s+(\w+?)s?\s+ago$", re.I)
_RE_IN = re.compile(
    r"^(?:in\s+)?(\d+|an?)\s+(\w+?)s?\s+(?:from\s+now|hence)$|^in\s+(\d+|an?)\s+(\w+)$", re.I
)
_RE_EPOCH = re.compile(r"^\d{10}(\d{3})?$")
# relative day + optional clock time: "tomorrow at 3pm", "yesterday 10:30",
# "today at noon" — natty composes day words with times freely
_RE_RELDAY_TIME = re.compile(
    r"^(today|tomorrow|yesterday|"
    r"(?:the\s+)?day\s+before\s+yesterday|(?:the\s+)?day\s+after\s+tomorrow)"
    r"(?:\s+(?:at\s+)?(?:(noon|midnight)|(\d{1,2})(?::(\d{2}))?(?::(\d{2}))?\s*(am|pm)?))?$",
    re.I,
)
# bare month-year ("october 2006") → the 1st of that month, natty's rule
_RE_MY = re.compile(rf"^({_MON})\.?\s+(\d{{4}})$", re.I)
# day of a RELATIVE month ("the 3rd of next month", "15th of last month",
# "the 1st of this month"), with natty's free clock-time composition
_RE_DAY_RELMONTH = re.compile(
    rf"^(?:the\s+)?(\d{{1,2}}){_ORD}\s+of\s+(next|last|this)\s+month{_TIMEX}$", re.I
)
# bare month anchor ("october", "in october") → the 1st of the NEAREST
# UPCOMING occurrence (current year if not yet past, else next year) —
# the month analog of "this tuesday"'s nearest-forward rule; a local
# convention documented against natty's (which anchors within the
# current year)
_RE_BARE_MONTH = re.compile(rf"^(?:in\s+)?({_MON})\.?$", re.I)
# fuzzy prefixes natty treats as decoration ("around noon", "about 3pm",
# "roughly next tuesday") — stripped before matching; the fuzz carries
# no offset
_RE_FUZZ = re.compile(r"\b(?:around|about|approximately|roughly)\s+", re.I)
# bare clock time ("noon", "3pm", "10:30", "10:30:15 pm") → TODAY at that
# time, natty's rule; a bare number without a colon or am/pm stays
# unparseable (too ambiguous)
_RE_ISOWEEK = re.compile(
    r"^(?:week\s+(\d{1,2})(?:\s+of\s+|,?\s+)(\d{4})|(\d{4})-?w(\d{1,2}))$",
    re.I,
)
_RE_BARE_TIME = re.compile(
    r"^(?:at\s+)?(?:(noon|midnight)|(\d{1,2}):(\d{2})(?::(\d{2}))?\s*(am|pm)?"
    r"|(\d{1,2})\s*(am|pm))$",
    re.I,
)
# week-of-month anchors: "the first monday of june", "last friday of
# march 2024", "second tuesday of next month" — with natty's free
# clock-time composition. A bare month (no year) anchors to its NEAREST
# UPCOMING occurrence, the _RE_BARE_MONTH convention.
_NTH = {
    "first": 1, "1st": 1, "second": 2, "2nd": 2, "third": 3, "3rd": 3,
    "fourth": 4, "4th": 4, "fifth": 5, "5th": 5, "last": -1,
}
_RE_NTH_WD = re.compile(
    rf"^(?:the\s+)?(first|1st|second|2nd|third|3rd|fourth|4th|fifth|5th|last)\s+"
    rf"({_WD})\s+(?:of|in)\s+"
    rf"(?:({_MON})\.?(?:\s+(\d{{4}}))?|(next|last|this)\s+month){_TIMEX}$",
    re.I,
)
# bare weekday ("friday", "on friday", "friday at 3pm") → the NEAREST
# upcoming occurrence (today included) — natty's "this <weekday>" rule
_RE_BARE_WD = re.compile(rf"^(?:on\s+)?({_WD})\.?{_TIMEX}$", re.I)
# date ranges ("between march 3 and march 5", "from monday to friday"):
# both endpoints must parse under this same grammar; the range resolves
# to its START — a documented local convention (natty returns the whole
# date group; a directive produces one timestamp per row)
_RE_RANGE = re.compile(
    r"^(?:between|from)\s+(.+?)\s+(?:and|to|until|through)\s+(.+)$", re.I
)
# relative-to-anchor composition ("a week from tomorrow", "2 days
# after next friday", "3 weeks before christmas"): the anchor clause
# recurses through THIS grammar, so every anchor form composes; natty
# documents the from/after/before family
_RE_FROM = re.compile(
    r"^(\d+|an?)\s+(\w+?)s?\s+(from|after|before)\s+(.+)$", re.I)
# period edges ("end of the month", "beginning of next year", "start
# of last week"): start = the period's first day 00:00, end = its LAST
# day 00:00 (a date, not an instant — the local convention, documented;
# weeks are ISO Monday-start like the rest of the repo)
_RE_EDGE = re.compile(
    rf"^(?:the\s+)?(end|beginning|start|middle)\s+of\s+(?:the\s+)?"
    rf"(?:(this|next|last)\s+)?(week|month|year){_TIMEX}$", re.I)
# holidays (natty's US set, public-domain fixed dates + the floating
# thanksgiving): optional next/last/this and explicit year; a bare
# holiday resolves to its NEAREST UPCOMING occurrence (today counts) —
# the bare-month convention
_HOLIDAY_FIXED = {
    "christmas": (12, 25), "christmas day": (12, 25),
    "christmas eve": (12, 24),
    "new year's day": (1, 1), "new years day": (1, 1),
    "new year's eve": (12, 31), "new years eve": (12, 31),
    "halloween": (10, 31),
    "valentine's day": (2, 14), "valentines day": (2, 14),
    # NOTE "july 4th" is absent: it already parses via the MDY branch
    # (current-year convention) — listing it here would change that
    "independence day": (7, 4), "fourth of july": (7, 4),
}
_HOL = "|".join(
    re.escape(h)
    for h in sorted(list(_HOLIDAY_FIXED) + ["thanksgiving"],
                    key=len, reverse=True)
)
_RE_HOLIDAY = re.compile(
    rf"^(?:(next|last|this)\s+)?(?:the\s+)?({_HOL})(?:\s+(\d{{4}}))?{_TIMEX}$",
    re.I,
)


def _holiday_md(name: str, year: int) -> tuple[int, int]:
    """(month, day) of a holiday in ``year`` — thanksgiving is the 4th
    Thursday of November (3 = Thursday in weekday numbering)."""
    if name == "thanksgiving":
        first_wd = datetime(year, 11, 1).weekday()
        return 11, 1 + (3 - first_wd) % 7 + 21
    return _HOLIDAY_FIXED[name]


def _timex(m, start: int) -> tuple[int, int, int]:
    """(hour, minute, second) from a ``_TIMEX`` tail whose five groups
    (noon|midnight, h, mm, ss, am/pm) start at ``start``; (0, 0, 0)
    when absent. Out-of-range values surface as ValueError at the
    caller's replace(), which every branch catches as unparseable."""
    if m.group(start):  # noon / midnight
        return (12 if m.group(start).lower() == "noon" else 0), 0, 0
    if m.group(start + 1) is None:
        return 0, 0, 0
    h = int(m.group(start + 1))
    mi = int(m.group(start + 2) or 0)
    sec = int(m.group(start + 3) or 0)
    ampm = (m.group(start + 4) or "").lower()
    if ampm == "pm" and h < 12:
        h += 12
    elif ampm == "am" and h == 12:
        h = 0
    return h, mi, sec


def _hms(m, start: int):
    """Pull the optional trailing time groups (h, m, s, am/pm) starting at
    group index ``start``; returns (hour, minute, second)."""
    if m.group(start) is None:
        return 0, 0, 0
    h = int(m.group(start))
    mi = int(m.group(start + 1))
    s = int(m.group(start + 2) or 0)
    ampm = (m.group(start + 3) or "").lower()
    if ampm == "pm" and h < 12:
        h += 12
    elif ampm == "am" and h == 12:
        h = 0
    return h, mi, s


def _shift_months(dt: datetime, months: int) -> datetime:
    y, m = divmod(dt.year * 12 + (dt.month - 1) + months, 12)
    day = min(dt.day, [31, 29 if y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)
                       else 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31][m])
    return dt.replace(year=y, month=m + 1, day=day)


def _count(tok: str) -> int:
    """Numeric count token; natty accepts the articles a/an as 1
    ("a week ago", "in an hour")."""
    return 1 if tok.lower() in ("a", "an") else int(tok)


def _apply_delta(base: datetime, n: int, unit: str) -> datetime | None:
    u = _UNITS.get(unit.lower())
    if u is None:
        return None
    if u == "months":
        return _shift_months(base, n)
    if u == "years":
        return _shift_months(base, 12 * n)
    if u == "fortnights":
        return base + timedelta(weeks=2 * n)
    return base + timedelta(**{u: n})


def parse_natural(s: str | None, now_utc: datetime, tz: str = "UTC") -> datetime | None:
    """Parse one natural-language date string → tz-aware UTC datetime, or
    None when the grammar doesn't match. ``now_utc`` is the reference
    instant (captured once on the driver at compile time so a run is
    internally consistent — a documented divergence from natty's
    per-row wall clock)."""
    if s is None:
        return None
    t = " ".join(s.strip().lower().split())
    if not t:
        return None
    t = _RE_FUZZ.sub("", t)  # "around noon" -> "noon": fuzz is decoration
    zone = ZoneInfo(tz)
    now_local = now_utc.astimezone(zone)
    midnight = now_local.replace(hour=0, minute=0, second=0, microsecond=0)

    m = _RE_RANGE.match(t)
    if m:
        start = parse_natural(m.group(1), now_utc, tz)
        end = parse_natural(m.group(2), now_utc, tz)
        # both endpoints must parse (a half-range is a malformed range,
        # not a date); the range resolves to its start
        return start if (start is not None and end is not None) else None

    if t in ("now", "right now", "just now"):
        return now_utc
    if t == "today":
        return now_utc  # natty resolves bare "today" to the current instant
    if t == "yesterday":
        return (now_local - timedelta(days=1)).astimezone(_tz.utc)
    if t == "tomorrow":
        return (now_local + timedelta(days=1)).astimezone(_tz.utc)

    m = _RE_RELDAY_TIME.match(t)
    if m:
        word = " ".join(m.group(1).split())
        off = {
            "today": 0, "tomorrow": 1, "yesterday": -1,
            "day after tomorrow": 2, "the day after tomorrow": 2,
            "day before yesterday": -2, "the day before yesterday": -2,
        }[word]
        base = now_local + timedelta(days=off)
        if m.group(2):  # noon / midnight
            h = 12 if m.group(2) == "noon" else 0
            out = base.replace(hour=h, minute=0, second=0, microsecond=0)
        elif m.group(3):
            h = int(m.group(3))
            mi = int(m.group(4) or 0)
            sec = int(m.group(5) or 0)
            ampm = (m.group(6) or "").lower()
            if ampm == "pm" and h < 12:
                h += 12
            elif ampm == "am" and h == 12:
                h = 0
            try:
                # the regex admits 25:75 etc. — unparseable like every
                # other branch, never a UDF-crashing ValueError
                out = base.replace(hour=h, minute=mi, second=sec, microsecond=0)
            except ValueError:
                return None
        else:
            # bare two-word day phrases keep the current clock time, the
            # yesterday/tomorrow rule above
            out = base
        return out.astimezone(_tz.utc)

    m = _RE_EPOCH.match(t)
    if m:
        v = int(t)
        return datetime.fromtimestamp(v / 1000 if m.group(1) else v, _tz.utc)

    m = _RE_NEXT_LAST.match(t)
    if m:
        word = m.group(1)
        what = m.group(2)
        if word == "this":
            # natty's "this tuesday": the NEAREST upcoming occurrence —
            # today if the weekday matches, else forward within 7 days;
            # "this week/month/year" resolves to the current period's
            # start-of-today anchor (the instant's own period)
            if what in _WEEKDAYS:
                delta = (_WEEKDAYS[what] - midnight.weekday()) % 7
                anchor = midnight + timedelta(days=delta)
            else:
                anchor = midnight
        else:
            direction = 1 if word == "next" else -1
            if what in _WEEKDAYS:
                delta = (_WEEKDAYS[what] - midnight.weekday()) % 7
                if direction == 1:
                    delta = delta or 7
                else:
                    delta = (delta - 7) if delta else -7
                anchor = midnight + timedelta(days=delta)
            elif what == "week":
                anchor = midnight + timedelta(weeks=direction)
            elif what == "month":
                anchor = _shift_months(midnight, direction)
            else:
                anchor = _shift_months(midnight, 12 * direction)
        if m.group(3):  # noon / midnight
            h, mi, sec = (12 if m.group(3).lower() == "noon" else 0), 0, 0
        elif m.group(4):
            h = int(m.group(4))
            mi = int(m.group(5) or 0)
            sec = int(m.group(6) or 0)
            ampm = (m.group(7) or "").lower()
            if ampm == "pm" and h < 12:
                h += 12
            elif ampm == "am" and h == 12:
                h = 0
        else:
            h = mi = sec = 0
        try:
            anchor = anchor.replace(hour=h, minute=mi, second=sec, microsecond=0)
        except ValueError:
            return None  # 25:75-style times: unparseable, never a UDF crash
        return anchor.astimezone(_tz.utc)

    m = _RE_AGO.match(t)
    if m:
        out = _apply_delta(now_local, -_count(m.group(1)), m.group(2))
        return out.astimezone(_tz.utc) if out else None

    m = _RE_IN.match(t)
    if m:
        n = _count(m.group(1) or m.group(3))
        unit = m.group(2) or m.group(4)
        out = _apply_delta(now_local, n, unit)
        return out.astimezone(_tz.utc) if out else None

    m = _RE_FROM.match(t)
    if m:
        # relative-to-anchor: "a week from tomorrow", "2 days after
        # next friday" — the anchor recurses through the whole grammar
        anchor = parse_natural(m.group(4), now_utc, tz)
        if anchor is None:
            return None
        sign = -1 if m.group(3).lower() == "before" else 1
        out = _apply_delta(
            anchor.astimezone(zone), sign * _count(m.group(1)), m.group(2))
        return out.astimezone(_tz.utc) if out else None

    m = _RE_DAY_RELMONTH.match(t)
    if m:
        day = int(m.group(1))
        anchor = _shift_months(
            midnight, {"next": 1, "last": -1, "this": 0}[m.group(2).lower()]
        )
        if m.group(3):  # noon / midnight
            h, mi, sec = (12 if m.group(3).lower() == "noon" else 0), 0, 0
        elif m.group(4):
            h = int(m.group(4))
            mi = int(m.group(5) or 0)
            sec = int(m.group(6) or 0)
            ampm = (m.group(7) or "").lower()
            if ampm == "pm" and h < 12:
                h += 12
            elif ampm == "am" and h == 12:
                h = 0
        else:
            h = mi = sec = 0
        try:
            # "the 31st of next month" when next month has 30 days is
            # unparseable (no clamping: the user named a day that does
            # not exist), like every other invalid-component branch
            out = anchor.replace(day=day, hour=h, minute=mi, second=sec, microsecond=0)
        except ValueError:
            return None
        return out.astimezone(_tz.utc)

    m = _RE_BARE_WD.match(t)
    if m:
        anchor = midnight + timedelta(
            days=(_WEEKDAYS[m.group(1).lower()] - midnight.weekday()) % 7
        )
        if m.group(2):  # noon / midnight
            h, mi, sec = (12 if m.group(2).lower() == "noon" else 0), 0, 0
        elif m.group(3):
            h = int(m.group(3))
            mi = int(m.group(4) or 0)
            sec = int(m.group(5) or 0)
            ampm = (m.group(6) or "").lower()
            if ampm == "pm" and h < 12:
                h += 12
            elif ampm == "am" and h == 12:
                h = 0
        else:
            h = mi = sec = 0
        try:
            out = anchor.replace(hour=h, minute=mi, second=sec)
        except ValueError:
            return None
        return out.astimezone(_tz.utc)

    m = _RE_BARE_TIME.match(t)
    if m:
        if m.group(1):  # noon / midnight
            h, mi, sec = (12 if m.group(1) == "noon" else 0), 0, 0
        elif m.group(2):  # h:mm[:ss] [am|pm]
            h = int(m.group(2))
            mi = int(m.group(3))
            sec = int(m.group(4) or 0)
            ampm = (m.group(5) or "").lower()
            if ampm == "pm" and h < 12:
                h += 12
            elif ampm == "am" and h == 12:
                h = 0
        else:  # bare hour + am/pm ("3pm")
            h = int(m.group(6))
            mi = sec = 0
            if m.group(7).lower() == "pm" and h < 12:
                h += 12
            elif m.group(7).lower() == "am" and h == 12:
                h = 0
        try:
            out = midnight.replace(hour=h, minute=mi, second=sec)
        except ValueError:
            return None
        return out.astimezone(_tz.utc)

    m = _RE_EDGE.match(t)
    if m:
        qual = (m.group(2) or "this").lower()
        period = m.group(3).lower()
        shift = {"this": 0, "next": 1, "last": -1}[qual]
        if period == "week":
            start = (midnight - timedelta(days=midnight.weekday())
                     + timedelta(weeks=shift))
            nxt = start + timedelta(weeks=1)
        elif period == "month":
            start = _shift_months(midnight.replace(day=1), shift)
            nxt = _shift_months(start, 1)
        else:  # year
            start = _shift_months(midnight.replace(month=1, day=1), 12 * shift)
            nxt = _shift_months(start, 12)
        word = m.group(1).lower()
        if word in ("beginning", "start"):
            anchor = start
        elif word == "middle":
            # mid-period convention: week -> Thursday (ISO day 4),
            # month -> the 15th, year -> July 1 — all 00:00 local
            if period == "week":
                anchor = start + timedelta(days=3)
            elif period == "month":
                anchor = start.replace(day=15)
            else:
                anchor = start.replace(month=7, day=1)
        else:
            anchor = nxt - timedelta(days=1)
        h, mi, sec = _timex(m, 4)
        try:
            out = anchor.replace(hour=h, minute=mi, second=sec, microsecond=0)
        except ValueError:
            return None
        return out.astimezone(_tz.utc)

    m = _RE_HOLIDAY.match(t)
    if m:
        qual = (m.group(1) or "").lower()
        name = " ".join(m.group(2).lower().split())
        if m.group(3):
            year = int(m.group(3))
        else:
            y = now_local.year
            mon, day = _holiday_md(name, y)
            cand = midnight.replace(year=y, month=mon, day=day)
            if qual == "next":       # strictly after today
                year = y + 1 if cand <= midnight else y
            elif qual == "last":     # strictly before today
                year = y - 1 if cand >= midnight else y
            else:                    # bare / "this": nearest upcoming
                year = y + 1 if cand < midnight else y
        mon, day = _holiday_md(name, year)
        h, mi, sec = _timex(m, 4)
        try:
            out = midnight.replace(year=year, month=mon, day=day,
                                   hour=h, minute=mi, second=sec,
                                   microsecond=0)
        except ValueError:
            return None
        return out.astimezone(_tz.utc)

    m = _RE_NTH_WD.match(t)
    if m:
        nth = _NTH[m.group(1).lower()]
        wd = _WEEKDAYS[m.group(2).lower()]
        if m.group(3):  # explicit month [year]
            mon = _MONTHS[m.group(3)]
            if m.group(4):
                year = int(m.group(4))
            else:
                # bare month: nearest upcoming, the _RE_BARE_MONTH rule
                year = now_local.year + (1 if mon < now_local.month else 0)
            anchor = midnight.replace(year=year, month=mon, day=1)
        else:  # next/last/this month
            anchor = _shift_months(
                midnight, {"next": 1, "last": -1, "this": 0}[m.group(5).lower()]
            ).replace(day=1)
        if nth == -1:
            nxt = _shift_months(anchor, 1)
            last_day = (nxt - timedelta(days=1)).day
            day = last_day - (anchor.replace(day=last_day).weekday() - wd) % 7
        else:
            day = 1 + (wd - anchor.weekday()) % 7 + 7 * (nth - 1)
            nxt = _shift_months(anchor, 1)
            if day > (nxt - timedelta(days=1)).day:
                return None  # "fifth monday of june" when june has four
        if m.group(6):  # noon / midnight
            h, mi, sec = (12 if m.group(6).lower() == "noon" else 0), 0, 0
        elif m.group(7):
            h = int(m.group(7))
            mi = int(m.group(8) or 0)
            sec = int(m.group(9) or 0)
            ampm = (m.group(10) or "").lower()
            if ampm == "pm" and h < 12:
                h += 12
            elif ampm == "am" and h == 12:
                h = 0
        else:
            h = mi = sec = 0
        try:
            out = anchor.replace(day=day, hour=h, minute=mi, second=sec)
        except ValueError:
            return None
        return out.astimezone(_tz.utc)

    m = _RE_MY.match(t)
    if m:
        try:
            return datetime(
                int(m.group(2)), _MONTHS[m.group(1)], 1, tzinfo=zone
            ).astimezone(_tz.utc)
        except ValueError:
            return None

    m = _RE_ISOWEEK.match(t)
    if m:
        # "week 12 of 2020" / "week 12, 2020" / "2020-W12" / "2020w12":
        # the ISO-8601 week's Monday 00:00 (weeks are Monday-start
        # everywhere in this grammar)
        week = int(m.group(1) or m.group(4))
        year = int(m.group(2) or m.group(3))
        try:
            iso = datetime.fromisocalendar(year, week, 1)
        except ValueError:
            return None
        return iso.replace(tzinfo=zone).astimezone(_tz.utc)

    m = _RE_BARE_MONTH.match(t)
    if m:
        mon = _MONTHS[m.group(1)]
        year = now_local.year + (1 if mon < now_local.month else 0)
        return datetime(year, mon, 1, tzinfo=zone).astimezone(_tz.utc)

    m = _RE_MDY.match(t)
    if m:
        mon, day = _MONTHS[m.group(1)], int(m.group(2))
        year = int(m.group(3)) if m.group(3) else now_local.year
        h, mi, sec = _hms(m, 4)
        try:
            return datetime(year, mon, day, h, mi, sec, tzinfo=zone).astimezone(_tz.utc)
        except ValueError:
            return None

    m = _RE_DMY.match(t)
    if m:
        day, mon = int(m.group(1)), _MONTHS[m.group(2)]
        year = int(m.group(3)) if m.group(3) else now_local.year
        h, mi, sec = _hms(m, 4)
        try:
            return datetime(year, mon, day, h, mi, sec, tzinfo=zone).astimezone(_tz.utc)
        except ValueError:
            return None

    return None
