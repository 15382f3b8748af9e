"""Token-bucket rate limiter — the Python analog of the reference's
per-partition Guava RateLimiter (SURVEY §2 A8).

The reference throttles each scan segment / write stream to
``targetCapacity × provisioned_capacity / n_partitions`` capacity
units per second, where consumed units are measured bytes
(bytesPerRCU = 4000 read, bytesPerWCU = 1000 write). There is no
cross-executor coordination — each partition gets a static share of
the budget, exactly like the reference divides the budget on the
driver (SURVEY §3).
"""

from __future__ import annotations

import time

BYTES_PER_RCU = 4000
BYTES_PER_WCU = 1000


class TokenBucket:
    """Permits-per-second limiter with burst = 1 second of budget.

    ``acquire(n)`` blocks until n permits are available. Mirrors
    Guava's RateLimiter semantics closely enough for throttling:
    permits accumulate at ``rate`` per second up to ``burst``.
    A non-positive rate disables limiting (on-demand/unlimited).
    """

    def __init__(self, rate: float, burst: float | None = None) -> None:
        self.rate = float(rate)
        self.burst = burst if burst is not None else max(self.rate, 1.0)
        self.tokens = self.burst
        self.last = time.monotonic()

    def acquire(self, permits: float) -> float:
        """Consume permits, sleeping as needed. Returns seconds slept."""
        if self.rate <= 0:
            return 0.0
        now = time.monotonic()
        self.tokens = min(self.burst, self.tokens + (now - self.last) * self.rate)
        self.last = now
        self.tokens -= permits
        if self.tokens >= 0:
            return 0.0
        wait = -self.tokens / self.rate
        time.sleep(wait)
        self.last = time.monotonic()
        self.tokens = 0.0
        return wait


def partition_rate(
    target_capacity: float, provisioned: float, n_partitions: int
) -> float:
    """Per-partition capacity-unit budget (driver-side division, A8)."""
    if provisioned <= 0 or target_capacity <= 0:
        return 0.0
    return max(target_capacity * provisioned / max(n_partitions, 1), 0.1)
