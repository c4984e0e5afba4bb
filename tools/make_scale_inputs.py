#!/usr/bin/env python3
"""Generate a reference-scale month of Citi-Bike-shaped staging input:
~1M trips (the reference's stated monthly volume, README.md:31), a full
month of hourly weather obs at :51, full covid coverage, ~1000 stations.
Deterministic (seed 42). Writes OUTSIDE the repo (default /tmp).

Usage: python3 tools/make_scale_inputs.py [outdir] [n_trips]
"""
import csv
import gzip
import io
import json
import os
import random
import sys
from datetime import datetime, timedelta, timezone

EVENT_HEADERS = ["tripduration", "starttime", "stoptime",
                 "start station id", "start station name",
                 "start station latitude", "start station longitude",
                 "end station id", "end station name",
                 "end station latitude", "end station longitude",
                 "bikeid", "usertype", "birth year", "gender"]


def main(out, n_trips):
    rng = random.Random(42)
    os.makedirs(f"{out}/events", exist_ok=True)
    os.makedirs(f"{out}/weathers", exist_ok=True)
    os.makedirs(f"{out}/stations", exist_ok=True)
    os.makedirs(f"{out}/covids", exist_ok=True)

    t0 = datetime(2020, 1, 1, tzinfo=timezone.utc)
    month_secs = 31 * 86400

    # events: two gz files (NYC ~87%, JC ~13%) like the real feeds
    def trip_row():
        start = t0 + timedelta(seconds=rng.randrange(month_secs),
                               milliseconds=rng.randrange(1000))
        dur = rng.randrange(61, 7200)
        s, e = rng.randrange(3000, 4000), rng.randrange(3000, 4000)
        birth = "" if rng.random() < 0.02 else str(rng.randrange(1940, 2004))
        return [dur, start.strftime("%Y-%m-%d %H:%M:%S.%f")[:-2], "",
                s, f"st {s}", "40.7", "-74.0", e, f"st {e}", "40.8", "-73.9",
                rng.randrange(30000, 45000),
                "Subscriber" if rng.random() < 0.8 else "Customer",
                birth, rng.randrange(0, 3)]

    for fname, count in [("202001-citibike-tripdata.csv.gz", int(n_trips * 0.87)),
                         ("JC-202001-citibike-tripdata.csv.gz", n_trips - int(n_trips * 0.87))]:
        buf = io.StringIO()
        w = csv.writer(buf)
        w.writerow(EVENT_HEADERS)
        for _ in range(count):
            w.writerow(trip_row())
        with gzip.open(f"{out}/events/{fname}", "wt") as f:
            f.write(buf.getvalue())

    # weather: every hour of the month at :51 (matches J2's -540s key)
    by_day = {}
    hour = t0.replace(minute=51)
    while hour < t0 + timedelta(days=31):
        day = hour.strftime("%Y%m%d")
        by_day.setdefault(day, []).append({
            "valid_time_gmt": int(hour.timestamp()),
            "temp": rng.randrange(20, 45), "dewPt": rng.randrange(10, 35),
            "rh": rng.randrange(30, 90),
            "day_ind": "D" if 6 <= hour.hour <= 18 else "N",
            "wspd": rng.randrange(0, 25),
            "gust": None if rng.random() < 0.5 else rng.randrange(15, 40),
            "pressure": round(29.0 + rng.random() * 2, 2),
            "precip_hrly": round(rng.random() * 0.3, 2) if rng.random() < 0.2 else 0.0,
            "wx_phrase": rng.choice(["Fair", "Cloudy", "Rain", "Snow"]),
        })
        hour += timedelta(hours=1)
    for day, obs in by_day.items():
        with open(f"{out}/weathers/{day}.json", "w") as f:
            json.dump(obs, f)

    # stations: 1000 + some duplicated snapshot rows
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(["", "station_id", "external_id", "name", "short_name",
                "region_id", "legacy_id", "station_type", "lat", "lon",
                "capacity", "has_kiosk", "electric_bike_surcharge_waiver",
                "eightd_has_key_dispenser", "rental_methods"])
    i = 0
    for sid in range(3000, 4000):
        for _ in range(2 if sid % 10 == 0 else 1):  # dup every 10th
            w.writerow([i, sid, f"uuid-{sid}", f"Station {sid}", f"{sid}.01",
                        71, sid, "classic", 40.7 + sid / 1e5, -74.0 + sid / 1e5,
                        rng.randrange(15, 60), "True", "False", "False",
                        "['KEY', 'CREDITCARD']"])
            i += 1
    with gzip.open(f"{out}/stations/stations.csv.gz", "wt") as f:
        f.write(buf.getvalue())

    # covids: full month coverage + zero-filled complement style
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(["", "DATE_OF_INTEREST",
                "BX_CASE_COUNT", "BX_PROBABLE_CASE_COUNT",
                "BK_CASE_COUNT", "BK_PROBABLE_CASE_COUNT",
                "MN_CASE_COUNT", "MN_PROBABLE_CASE_COUNT",
                "QN_CASE_COUNT", "QN_PROBABLE_CASE_COUNT",
                "SI_CASE_COUNT", "SI_PROBABLE_CASE_COUNT", "INCOMPLETE"])
    for d in range(31):
        day = (t0 + timedelta(days=d)).strftime("%m/%d/%Y")
        w.writerow([d, day] + [0] * 11)
    with gzip.open(f"{out}/covids/covid_cases.csv.gz", "wt") as f:
        f.write(buf.getvalue())
    print(f"wrote reference-scale month ({n_trips} trips) under {out}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/citibike_scale"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    main(out, n)
