#!/usr/bin/env python3
"""Package the executed acceptance runs as executed .ipynb notebooks.

The reference's de-facto acceptance suite is five notebooks committed WITH
their outputs (/root/reference/notebooks/*.ipynb — SURVEY.md §4/§6). The
spmf_tpu equivalents are the examples/*.py scripts plus their committed
execution artifacts (examples/artifacts/*.log stdout + *.png figures, run
on the real TPU v5e chip). This script assembles those into notebooks/
<name>.ipynb whose single code cell carries the script source and whose
outputs are the REAL recorded stdout stream and figures — the committed-
executed-notebook artifact format of the reference, byte-for-byte honest
about where the outputs came from (see the provenance cell).

Regenerate after re-running the examples:  python examples/make_notebooks.py
"""
import base64
import datetime
import os
import re
import subprocess

import nbformat as nbf

HERE = os.path.dirname(os.path.abspath(__file__))
ART = os.path.join(HERE, "artifacts")
OUT = os.path.join(HERE, "notebooks")

CONFIGS = [
    # (script, log, figures, reference notebook)
    ("factorizing_random_noise", ["noise_encoding.png"],
     "notebooks/factorizing_random_noise.ipynb"),
    ("factorize_linear_structure", ["factorize_linear_structure.png"],
     "notebooks/factorize_linear_structure.ipynb"),
    ("factorize_nonlinear_structure", ["factorize_nonlinear_structure.png"],
     "notebooks/factorize_nonlinear_structure.ipynb"),
    ("simulation_figure", ["simulation_figure.png"],
     "notebooks/simulation_figure.ipynb"),
    ("rnaseq_walkthrough", [], "notebooks/rnaseq.ipynb"),
]


def main():
    os.makedirs(OUT, exist_ok=True)
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=HERE,
            capture_output=True, text=True).stdout.strip()
    except Exception:
        commit = "unknown"
    for name, figures, ref in CONFIGS:
        src = open(os.path.join(HERE, name + ".py")).read()
        log = open(os.path.join(ART, name + ".log")).read()
        log = re.sub(r"^WARNING:.*$\n?", "", log, flags=re.M)
        mtime = os.path.getmtime(os.path.join(ART, name + ".log"))
        when = datetime.datetime.fromtimestamp(mtime).strftime("%Y-%m-%d")

        nb = nbf.v4.new_notebook()
        nb.cells.append(nbf.v4.new_markdown_cell(
            f"# {name}\n\n"
            f"spmf_tpu acceptance run — the committed-executed counterpart "
            f"of the reference's `{ref}`.\n\n"
            f"**Provenance:** outputs below are the recorded stdout and "
            f"figures of `examples/{name}.py` executed on a real TPU v5e "
            f"chip on {when} (repo commit {commit}; raw artifacts in "
            f"`examples/artifacts/`). Assembled by "
            f"`examples/make_notebooks.py`."
        ))
        outputs = [nbf.v4.new_output("stream", name="stdout", text=log)]
        for fig in figures:
            with open(os.path.join(ART, fig), "rb") as f:
                data = base64.b64encode(f.read()).decode()
            outputs.append(nbf.v4.new_output(
                "display_data", data={"image/png": data},
                metadata={"filename": fig}))
        cell = nbf.v4.new_code_cell(src, execution_count=1, outputs=outputs)
        nb.cells.append(cell)
        path = os.path.join(OUT, name + ".ipynb")
        nbf.write(nb, path)
        print("wrote", os.path.relpath(path, HERE))


if __name__ == "__main__":
    main()
