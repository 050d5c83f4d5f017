"""Reference-parity IOC pipeline (SURVEY.md EP-A / EP-B), Spark-first.

The reference (`/root/reference/src/Datalake2Anomali.py`) runs a fixed
driver-side dataflow over Python lists; here each step is a pure
``DataFrame -> DataFrame`` transform so Catalyst owns the physical plan:

- ``specs``       query-spec validation (F1) and spec dimension frame (J2)
- ``schemas``     explicit StructTypes + the two static dimension tables
- ``transforms``  positional parse (P1/P2), type dim join (J1/F2), md5 filter
                  (F3), itype coalesce (J3), indicator generation (EP-A core)
- ``payload``     confidence (A1), type-keyed pivot (P4), tag assembly
                  (P5/P6), payload JSON (P7/P8/S6)
- ``upsert``      existence-probe routing (J4/K2/K3/K4) + high-watermark (A2)
"""

from . import payload, schemas, specs, transforms, upsert  # noqa: F401
