"""Frequency parsing for resample/interpolate operators.

Semantics match the reference's allowable-frequency table
(reference: python/tempo/resample.py:57-78,256-305): a frequency is
"<n> <unit>" or a bare unit, units from microseconds up to days.
Everything here is pure Python — no Spark dependency — so it can be
used at plan-build time on the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

# canonical unit -> (seconds-per-unit, spark interval keyword)
_UNITS: dict[str, tuple[float, str]] = {
    "microsecond": (1e-6, "microsecond"),
    "millisecond": (1e-3, "millisecond"),
    "second": (1.0, "second"),
    "minute": (60.0, "minute"),
    "hour": (3600.0, "hour"),
    "day": (86400.0, "day"),
}

_ALIASES: dict[str, str] = {
    "musec": "microsecond", "musecs": "microsecond",
    "microsecond": "microsecond", "microseconds": "microsecond", "us": "microsecond",
    "ms": "millisecond", "millis": "millisecond", "millisecond": "millisecond",
    "milliseconds": "millisecond",
    "s": "second", "sec": "second", "secs": "second", "second": "second",
    "seconds": "second",
    "m": "minute", "min": "minute", "mins": "minute", "minute": "minute",
    "minutes": "minute",
    "h": "hour", "hr": "hour", "hrs": "hour", "hour": "hour", "hours": "hour",
    "d": "day", "day": "day", "days": "day",
}


@dataclass(frozen=True)
class Freq:
    """A parsed resample frequency."""

    period: int
    unit: str  # canonical singular unit name

    @property
    def seconds(self) -> float:
        return self.period * _UNITS[self.unit][0]

    @property
    def interval(self) -> str:
        """Spark/ANSI interval string, e.g. ``interval 30 second``."""
        return f"interval {self.period} {self.unit}"

    @property
    def window_duration(self) -> str:
        """Duration string for ``F.window`` / time_bucket, e.g. ``30 seconds``."""
        return f"{self.period} {self.unit}s" if self.period != 1 else f"1 {self.unit}"


def parse_freq(freq: str | Freq) -> Freq:
    """Parse ``"30 seconds"`` / ``"1 min"`` / ``"sec"`` into a :class:`Freq`.

    Raises ``ValueError`` on unknown units or malformed strings.
    """
    if isinstance(freq, Freq):
        return freq
    if not isinstance(freq, str):
        raise TypeError(f"freq must be a string, got {type(freq).__name__}")
    parts = freq.strip().lower().split()
    if len(parts) == 1:
        period_s, unit_s = "1", parts[0]
        # allow compact forms like "30s" / "5min"
        head = unit_s.rstrip("abcdefghijklmnopqrstuvwxyz")
        if head:
            period_s, unit_s = head, unit_s[len(head):]
    elif len(parts) == 2:
        period_s, unit_s = parts
    else:
        raise ValueError(f"cannot parse frequency {freq!r}")
    if unit_s not in _ALIASES:
        raise ValueError(f"unknown frequency unit {unit_s!r} in {freq!r}")
    try:
        period = int(period_s)
    except ValueError as exc:
        raise ValueError(f"invalid period {period_s!r} in {freq!r}") from exc
    if period <= 0:
        raise ValueError(f"period must be positive in {freq!r}")
    return Freq(period, _ALIASES[unit_s])
