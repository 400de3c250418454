#!/usr/bin/env python
"""Concurrent-load driver for serve.py: N closed-loop clients hammer
/generate and we report p50/p95 request latency, throughput, and shed
(503) counts per concurrency level — serving behavior under load, not
just single-request latency (round-3 gap).

Closed-loop clients: each keeps exactly one request in flight, so offered
load ~= N / service_time.  With generation serialized on one chip the
expected shape is: throughput saturates at the single-batch decode rate,
p50 grows ~linearly with N (queueing), and past --max_queue the server
sheds with 503 + Retry-After instead of letting the tail grow without
bound.

Usage:
  python serve.py --init_random --batch 4 --port 8931 &   # server first
  python scripts/serve_load.py --port 8931 --clients 2,8,32 \
      --requests_per_client 6
"""

import argparse
import json
import threading
import time
import urllib.error
import urllib.request


def run_level(base, n_clients, reqs, num):
    lat, shed, errors = [], [0], []
    lock = threading.Lock()

    def client(ci):
        for r in range(reqs):
            body = json.dumps({"classes": [ci % 8], "num": num,
                               "seed": ci * 1000 + r,
                               "format": "json"}).encode()
            req = urllib.request.Request(
                f"{base}/generate", data=body,
                headers={"Content-Type": "application/json"})
            t0 = time.time()
            try:
                with urllib.request.urlopen(req, timeout=600) as resp:
                    resp.read()
                with lock:
                    lat.append(time.time() - t0)
            except urllib.error.HTTPError as e:
                e.read()
                with lock:
                    if e.code == 503:
                        shed[0] += 1
                    else:
                        errors.append(e.code)
                time.sleep(0.2)   # back off as Retry-After suggests
            except OSError as e:
                with lock:
                    errors.append(str(e))

    t0 = time.time()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    lat.sort()

    def pct(p):
        return round(lat[min(len(lat) - 1, int(p * len(lat)))], 3) \
            if lat else None

    return {"clients": n_clients,
            "completed": len(lat), "shed_503": shed[0],
            "errors": errors[:5],
            "p50_s": pct(0.50), "p95_s": pct(0.95),
            "max_s": round(lat[-1], 3) if lat else None,
            "wall_s": round(wall, 1),
            "clips_per_s": round(len(lat) * num / wall, 2),
            "requests_per_s": round(len(lat) / wall, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8931)
    ap.add_argument("--clients", default="2,8,32")
    ap.add_argument("--requests_per_client", type=int, default=6)
    ap.add_argument("--num", type=int, default=1,
                    help="clips per request")
    args = ap.parse_args()
    base = f"http://{args.host}:{args.port}"

    with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
        health = json.loads(r.read())
    print(json.dumps({"server": {"batch": health["batch"],
                                 "platform": health["platform"],
                                 "queue_max": health.get(
                                     "queue", {}).get("max")}}))

    rows = []
    for n in (int(x) for x in args.clients.split(",")):
        row = run_level(base, n, args.requests_per_client, args.num)
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"levels": rows}))


if __name__ == "__main__":
    main()
