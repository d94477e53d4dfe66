"""Save .explain('formatted') output for named catalog queries.

Usage: python tools/save_plans.py <repo> <outdir> <suffix> <sf_dir> q [q...]
(the round-13 plans/r13/<query>_{before,after}.txt generator; <repo>
lets a git worktree of an older checkout produce the 'before' plans)."""
import contextlib
import io
import os
import sys

repo, outdir, suffix, sf_dir = sys.argv[1:5]
sys.path.insert(0, repo)
from rigatoni_spark.catalog import QUERIES  # noqa: E402
from rigatoni_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="save_plans")
spark.sparkContext.setLogLevel("ERROR")
os.makedirs(outdir, exist_ok=True)
for name in sys.argv[5:]:
    df = QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
        fh.write(buf.getvalue())
    print("saved", name, suffix)
spark.stop()
