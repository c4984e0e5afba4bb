#!/usr/bin/env python3
"""Generate tiny Citi-Bike-shaped staging fixtures per FIXTURES.md.

Writes gzipped CSV / JSON staging files under src/test/resources/citibike/
mirroring exactly what the reference's scans see (SURVEY.md §2.1):
events + stations + covids as gzipped CSV with header, weathers as
JSON array files. Deterministic — no randomness.
"""
import csv
import gzip
import io
import json
import os
from datetime import datetime, timedelta, timezone

BASE = os.path.join(os.path.dirname(__file__), "..",
                    "src", "test", "resources", "citibike")

EVENT_HEADERS = ["tripduration", "starttime", "stoptime",
                 "start station id", "start station name",
                 "start station latitude", "start station longitude",
                 "end station id", "end station name",
                 "end station latitude", "end station longitude",
                 "bikeid", "usertype", "birth year", "gender"]


def write_gz_csv(path, headers, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(headers)
    w.writerows(rows)
    with gzip.open(path, "wt") as f:
        f.write(buf.getvalue())


def hour_epoch(ts_str):
    """Epoch seconds of the trip's hour truncation (UTC, like the ELT)."""
    dt = datetime.strptime(ts_str[:13], "%Y-%m-%d %H")
    return int(dt.replace(tzinfo=timezone.utc).timestamp())


def main():
    # --- events: two files (NYC + JC glob-union), 2020 layout ----------
    def trip(dur, start, sid, eid, bike, utype, birth, gender):
        return [dur, start, "", sid, f"st {sid}", "40.7", "-74.0",
                eid, f"st {eid}", "40.8", "-73.9", bike, utype, birth, gender]

    nyc = [
        trip(320, "2020-01-01 08:12:03.1230", 72, 79, 30001, "Subscriber", 1979, 1),
        trip(610, "2020-01-01 08:45:10.0000", 79, 82, 30002, "Customer", 1990, 2),
        # same hour as the first two -> shared weather bucket
        trip(95,  "2020-01-01 09:01:00.5000", 82, 72, 30001, "Subscriber", 1985, 1),
        # empty birth year -> NULL -> null-propagating user_agg_id
        trip(400, "2020-01-02 10:30:00.0000", 72, 82, 30003, "Customer", "", 0),
        # date missing from covid fixture -> LEFT-join null covid_id
        trip(512, "2020-01-05 11:00:59.9999", 79, 72, 30002, "Subscriber", 1972, 2),
        # duplicate (starttime, bikeid) -> md5 key collision behavior
        trip(320, "2020-01-01 08:12:03.1230", 72, 79, 30001, "Subscriber", 1979, 1),
    ]
    jc = [
        trip(222, "2020-01-02 18:05:30.0000", 3186, 3187, 40001, "Subscriber", 1995, 1),
        trip(777, "2020-01-03 07:59:59.0000", 3187, 3186, 40002, "Customer", 2000, 2),
    ]
    write_gz_csv(f"{BASE}/events/202001-citibike-tripdata.csv.gz", EVENT_HEADERS, nyc)
    write_gz_csv(f"{BASE}/events/JC-202001-citibike-tripdata.csv.gz", EVENT_HEADERS, jc)

    # --- weathers: one JSON array file per day, obs at :51 past hour ---
    # J2: trip hour epoch - 540 s == HH-1:51:00 observation epoch.
    trips = nyc + jc
    buckets = sorted({hour_epoch(t[1]) - 540 for t in trips})
    os.makedirs(f"{BASE}/weathers", exist_ok=True)
    by_day = {}
    for i, b in enumerate(buckets):
        day = datetime.fromtimestamp(b, tz=timezone.utc).strftime("%Y%m%d")
        by_day.setdefault(day, []).append({
            "valid_time_gmt": b,
            "temp": 30 + i,
            "dewPt": 20 + i,
            "rh": 50 + i,
            "day_ind": "D" if 6 <= datetime.fromtimestamp(b, tz=timezone.utc).hour <= 18 else "N",
            "wspd": 5 + i,
            "gust": None if i % 2 == 0 else 15 + i,  # nulls for CASE WHEN
            "pressure": 29.8 + i / 10.0,
            "precip_hrly": 0.0 if i % 3 else 0.1,
            "wx_phrase": ["Fair", "Cloudy", "Rain"][i % 3],
        })
    for day, obs in by_day.items():
        with open(f"{BASE}/weathers/{day}.json", "w") as f:
            json.dump(obs, f)

    # --- stations: pandas-style CSV with leading index col + dup row --
    st_headers = ["", "station_id", "external_id", "name", "short_name",
                  "region_id", "legacy_id", "station_type", "lat", "lon",
                  "capacity", "has_kiosk", "electric_bike_surcharge_waiver",
                  "eightd_has_key_dispenser", "rental_methods"]
    st_rows = [
        [0, 72, "66db237e-0aca-11e7-82f6-3863bb44ef7c", "W 52 St & 11 Ave",
         "6926.01", 71, 72, "classic", 40.76727216, -73.99392888, 55, "True",
         "False", "False", "['KEY', 'CREDITCARD']"],
        [1, 79, "0f1512dd-0aca-11e7-82f6-3863bb44ef7c", "Franklin St & W Broadway",
         "5430.08", 71, 79, "classic", 40.71911552, -74.00666661, 33, "True",
         "False", "False", "['KEY', 'CREDITCARD']"],
        [2, 82, "1f5194ab-0aca-11e7-82f6-3863bb44ef7c", "St James Pl & Pearl St",
         "5167.06", 71, 82, "classic", 40.71117416, -74.00016545, 27, "True",
         "False", "False", "['KEY', 'CREDITCARD']"],
        [3, 3186, "97bbd0c8-0aca-11e7-82f6-3863bb44ef7c", "Grove St PATH",
         "JC005", 70, 3186, "classic", 40.71958612, -74.04311746, 32, "True",
         "False", "False", "['KEY', 'CREDITCARD']"],
        [4, 3187, "a5ef1a18-0aca-11e7-82f6-3863bb44ef7c", "Warren St",
         "JC006", 70, 3187, "classic", 40.7211236, -74.03805095, 21, "True",
         "False", "False", "['KEY', 'CREDITCARD']"],
        # exact duplicate of station 72 (DISTINCT coverage)
        [5, 72, "66db237e-0aca-11e7-82f6-3863bb44ef7c", "W 52 St & 11 Ave",
         "6926.01", 71, 72, "classic", 40.76727216, -73.99392888, 55, "True",
         "False", "False", "['KEY', 'CREDITCARD']"],
    ]
    write_gz_csv(f"{BASE}/stations/stations.csv.gz", st_headers, st_rows)

    # --- covids: UPPERCASE headers, MM/dd/yyyy, covering events dates
    #     except 2020-01-05; one all-zero complement-style row ---------
    co_headers = ["", "DATE_OF_INTEREST",
                  "BX_CASE_COUNT", "BX_PROBABLE_CASE_COUNT",
                  "BK_CASE_COUNT", "BK_PROBABLE_CASE_COUNT",
                  "MN_CASE_COUNT", "MN_PROBABLE_CASE_COUNT",
                  "QN_CASE_COUNT", "QN_PROBABLE_CASE_COUNT",
                  "SI_CASE_COUNT", "SI_PROBABLE_CASE_COUNT", "INCOMPLETE"]
    co_rows = [
        [0, "01/01/2020", 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],  # complement-style
        [1, "01/02/2020", 1, 0, 2, 1, 3, 0, 1, 0, 0, 0, 0],
        [2, "01/03/2020", 2, 1, 0, 0, 5, 2, 2, 1, 1, 0, 0],
        # 2020-01-05 intentionally absent
    ]
    write_gz_csv(f"{BASE}/covids/covid_cases.csv.gz", co_headers, co_rows)
    print("fixtures written under", os.path.abspath(BASE))


if __name__ == "__main__":
    main()
