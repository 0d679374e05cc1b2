"""Camera sensor-width database.

Counterpart of the reference's sensor DB (ref:
src/aliceVision/sensorDB/parseDatabase.hpp + cameraSensors.db — a
"make;model;width_mm" CSV of ~20k rows). We ship a compact built-in table
of common sensor formats and support loading any CSV in the reference's
format (including the reference's own cameraSensors.db if the user points
at one).
"""

from __future__ import annotations

# Minimal built-in fallback table (sensor width in mm). Matching is
# case-insensitive substring on "make model".
BUILTIN_SENSORS = {
    "canon eos 5d mark iii": 36.0,
    "canon eos 5d mark iv": 36.0,
    "canon eos r5": 36.0,
    "canon eos 80d": 22.3,
    "nikon d850": 35.9,
    "nikon d750": 35.9,
    "nikon d3400": 23.5,
    "sony ilce-7m3": 35.8,
    "sony ilce-7rm4": 35.7,
    "sony ilce-6000": 23.5,
    "fujifilm x-t3": 23.5,
    "fujifilm x-t4": 23.5,
    "dji fc330": 6.25,
    "dji fc6310": 13.2,
    "dji zemuse x7": 23.5,
    "apple iphone 12": 5.7,
    "apple iphone 13": 7.0,
    "apple iphone 14": 7.6,
    "gopro hero8 black": 6.17,
    "gopro hero10 black": 6.17,
}

_DEFAULT_WIDTH_MM = 36.0


def parse_database(path: str) -> dict:
    """Parse a 'Make;Model;WidthMM[;source]' CSV into {key: width_mm}."""
    db = {}
    with open(path, "r", errors="ignore") as f:
        for line in f:
            parts = line.strip().split(";")
            if len(parts) < 3:
                continue
            make, model, width = parts[0], parts[1], parts[2]
            try:
                w = float(width)
            except ValueError:
                continue
            if w > 0:
                db[f"{make} {model}".strip().lower()] = w
    return db


def sensor_width_mm(make: str, model: str, db: dict | None = None) -> tuple[float, bool]:
    """Look up the sensor width; returns (width_mm, found)."""
    table = dict(BUILTIN_SENSORS)
    if db:
        table.update(db)
    key = f"{make} {model}".strip().lower()
    if key in table:
        return table[key], True
    model_l = model.strip().lower()
    for k, v in table.items():
        if model_l and model_l in k:
            return v, True
    return _DEFAULT_WIDTH_MM, False


def focal_px_from_exif(meta: dict, width_px: int, db: dict | None = None) -> tuple[float, bool]:
    """Focal in pixels from EXIF focal_mm + sensor width; falls back to
    1.2 * max dimension like the reference's unknown-intrinsic default."""
    focal_mm = meta.get("focal_mm")
    if focal_mm:
        w_mm, found = sensor_width_mm(meta.get("make", ""), meta.get("model", ""), db)
        return focal_mm / w_mm * width_px, found
    return 1.2 * width_px, False
