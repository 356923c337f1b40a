"""CF-convention time codec (SURVEY.md F16/F17, DateVariable parity).

Reference: /root/reference/trefoil/netcdf/variable.py:429-542 — CF time
axes are ints + ``units`` ("<unit>s since <date>") + ``calendar``.
Standard/gregorian/julian-after-1582 map to real timestamps; 360_day and
noleap calendars have no TimestampType equivalent, so they stay integer
columns with a pure-python codec (SURVEY.md §7.2 "don't force
TimestampType").

Unit inference from consecutive deltas mirrors variable.py:490-518.
"""

from __future__ import annotations

import datetime
import re

_UNIT_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
}

_DAYS_PER_MONTH_NOLEAP = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


def parse_units(units: str) -> tuple[str, datetime.datetime]:
    """'days since 1990-01-01 00:00:00' -> ('day', datetime(1990, 1, 1))."""
    m = re.match(r"(\w+?)s?\s+since\s+(.+)", units.strip())
    if not m:
        raise ValueError(f"Unparseable CF units: {units!r}")
    unit = m.group(1).lower().rstrip("s")
    datestr = m.group(2).strip()
    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M", "%Y-%m-%d", "%Y-%m-%dT%H:%M:%S"):
        try:
            return unit, datetime.datetime.strptime(datestr, fmt)
        except ValueError:
            continue
    raise ValueError(f"Unparseable CF epoch: {datestr!r}")


def num2date(values, units: str, calendar: str = "standard"):
    """CF ints → datetimes (standard) or (year, month, day, sec) tuples
    (360_day / noleap — calendars real datetimes can't represent)."""
    unit, epoch = parse_units(units)
    cal = calendar.lower()
    out = []
    for v in values:
        if cal in ("standard", "gregorian", "proleptic_gregorian", "julian"):
            if unit == "year":
                out.append(epoch.replace(year=epoch.year + int(v)))
            elif unit == "month":
                total = epoch.month - 1 + int(v)
                out.append(epoch.replace(year=epoch.year + total // 12, month=total % 12 + 1))
            else:
                out.append(epoch + datetime.timedelta(seconds=float(v) * _UNIT_SECONDS[unit]))
        elif cal in ("360_day", "noleap", "365_day"):
            out.append(_fixed_calendar_add(epoch, float(v), unit, cal))
        else:
            raise ValueError(f"Unsupported calendar: {calendar}")
    return out


def _fixed_calendar_add(epoch: datetime.datetime, v: float, unit: str, cal: str):
    """Integer arithmetic in fixed-length calendars → (y, m, d, sec)."""
    if unit == "year":
        return (epoch.year + int(v), epoch.month, epoch.day, 0)
    if unit == "month":
        total = epoch.month - 1 + int(v)
        return (epoch.year + total // 12, total % 12 + 1, epoch.day, 0)
    seconds = v * _UNIT_SECONDS[unit]
    days, rem = divmod(seconds, 86400)
    days = int(days)
    if cal == "360_day":
        doy = (epoch.month - 1) * 30 + (epoch.day - 1) + days
        year = epoch.year + doy // 360
        doy %= 360
        return (year, doy // 30 + 1, doy % 30 + 1, rem)
    # noleap / 365_day
    cum = []
    s = 0
    for d in _DAYS_PER_MONTH_NOLEAP:
        cum.append(s)
        s += d
    doy = cum[epoch.month - 1] + (epoch.day - 1) + days
    year = epoch.year + doy // 365
    doy %= 365
    month = max(i for i, c in enumerate(cum) if c <= doy)
    return (year, month + 1, doy - cum[month] + 1, rem)


def date2num(dates, units: str, calendar: str = "standard"):
    """Datetimes → CF numbers (standard calendar only; fixed calendars
    round-trip through their tuple form)."""
    unit, epoch = parse_units(units)
    if calendar.lower() not in ("standard", "gregorian", "proleptic_gregorian"):
        raise ValueError("date2num supports standard-family calendars")
    out = []
    for d in dates:
        delta = (d - epoch).total_seconds()
        out.append(delta / _UNIT_SECONDS[unit])
    return out


def infer_unit(deltas_seconds: list[float]) -> str:
    """Reference variable.py:490-518 heuristic: pick the unit whose length
    divides the (constant) consecutive delta."""
    if not deltas_seconds:
        return "day"
    d = deltas_seconds[0]
    if d % 86400 == 0:
        if d >= 365 * 86400:
            return "year"
        if d >= 28 * 86400:
            return "month"
        return "day"
    if d % 3600 == 0:
        return "hour"
    if d % 60 == 0:
        return "minute"
    return "second"
