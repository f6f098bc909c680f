"""Run-header logging: config pretty-print and device memory stats.

Equivalents of the reference's hx_utils niceties (hx_utils/log.py
print_config — a rich YAML panel; GPU watch) without non-hermetic
dependencies: plain-text box for the config, and TPU HBM figures from
``device.memory_stats()`` where the backend exposes them.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import yaml


def print_config(cfg: Any, title: str = "Config") -> str:
    """Boxed YAML dump of the config dataclass tree; returns the text."""
    from hierdiff_tpu.config import config_to_dict

    body = yaml.safe_dump(config_to_dict(cfg), sort_keys=False).rstrip()
    lines = body.splitlines()
    width = max(len(title) + 2, *(len(ln) for ln in lines)) + 2
    out = [f"+-- {title} " + "-" * max(0, width - len(title) - 4) + "+"]
    out += [f"| {ln.ljust(width - 2)} |" for ln in lines]
    out.append("+" + "-" * width + "+")
    text = "\n".join(out)
    print(text, flush=True)
    return text


def device_memory_stats(device=None) -> Optional[Dict[str, int]]:
    """Allocator stats for one device (bytes), or None if unavailable."""
    import jax

    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    return {k: int(v) for k, v in stats.items() if isinstance(v, (int, float))}


def log_device_stats() -> None:
    """One-line HBM usage summary per local device."""
    import jax

    for d in jax.local_devices():
        s = device_memory_stats(d)
        if s is None:
            print(f"[mem] {d}: stats unavailable")
            continue
        used = s.get("bytes_in_use", 0) / 2**30
        limit = s.get("bytes_limit", 0) / 2**30
        peak = s.get("peak_bytes_in_use", 0) / 2**30
        print(f"[mem] {d}: {used:.2f} GiB in use (peak {peak:.2f}) "
              f"/ {limit:.2f} GiB", flush=True)
