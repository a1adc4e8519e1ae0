"""Print system/environment/accelerator info (marius_env_info parity,
tools/distribution/marius_env_info.py:176)."""

from __future__ import annotations

import platform
import sys
from typing import Dict


def collect_env_info() -> Dict[str, Dict]:
    info: Dict[str, Dict] = {
        "python": {
            "version": sys.version.split()[0],
            "executable": sys.executable,
        },
        "platform": {
            "system": platform.system(),
            "release": platform.release(),
            "machine": platform.machine(),
            "processor": platform.processor() or "unknown",
        },
    }
    try:
        import numpy
        info["numpy"] = {"version": numpy.__version__}
    except ImportError:
        pass
    try:
        import jax
        info["jax"] = {"version": jax.__version__}
        devices = jax.devices()
        info["devices"] = {
            "count": len(devices),
            "platform": devices[0].platform if devices else "none",
            "kinds": sorted({d.device_kind for d in devices}),
        }
    except Exception as e:  # jax present but no backend
        info["jax"] = {"error": str(e)}
    import marius_tpu
    info["marius_tpu"] = {"version": marius_tpu.__version__}
    return info


def format_env_info() -> str:
    import yaml
    return yaml.safe_dump(collect_env_info(), sort_keys=False)
