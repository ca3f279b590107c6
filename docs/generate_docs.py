"""Documentation generator.

The reference ships a Sphinx tree (``docs/source``) with generated model
option and field tables; this produces the same artefacts as plain
markdown straight from the code — no external doc dependencies:

    python docs/generate_docs.py      # writes docs/*.md

* ``field_documentation.md`` — every registered field (2D + 3D) with
  name, shortname, unit and output filename (the reference's
  ``field_documentation.rst`` generator).
* ``model_options.md`` — ModelOptions2d/3d + GLS/sediment/NH sub-option
  trees with default values (the reference's ``model_options_2d/3d``
  pages from the traitlets registry).
* ``api.md`` — public module index with first docstring paragraphs.
"""
import importlib
import inspect
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def gen_field_docs(out):
    from thetis_tpu.model.field_defs import field_metadata

    lines = ["# Field documentation", "",
             "Every registered prognostic/diagnostic field "
             "(`thetis_tpu/model/field_defs.py`).", "",
             "| key | name | shortname | unit | output file |",
             "|---|---|---|---|---|"]
    for key in sorted(field_metadata):
        m = field_metadata[key]
        lines.append(
            f"| `{key}` | {m.get('name', '')} | {m.get('shortname', '')} "
            f"| {m.get('unit', '-')} | {m.get('filename', key)} |"
        )
    open(os.path.join(out, "field_documentation.md"), "w").write(
        "\n".join(lines) + "\n")


def _options_table(obj, title, seen=None):
    lines = [f"## {title}", "", "| option | default |", "|---|---|"]
    sub = []
    for k in sorted(vars(obj)):
        if k.startswith("_"):
            continue
        v = getattr(obj, k)
        if hasattr(v, "_isfrozen") or type(v).__name__.endswith("Options"):
            sub.append((k, v))
            lines.append(f"| `{k}` | *(sub-options, see below)* |")
            continue
        r = repr(v)
        if len(r) > 60:
            r = r[:57] + "..."
        lines.append(f"| `{k}` | `{r}` |")
    lines.append("")
    for k, v in sub:
        lines += _options_table(v, f"{title}.{k}")
    return lines


def gen_option_docs(out):
    from thetis_tpu.model.options import ModelOptions2d
    from thetis_tpu.model.flowsolver3d import ModelOptions3d

    lines = ["# Model options", "",
             "Default values of the frozen option trees "
             "(`thetis_tpu/model/options.py`).", ""]
    lines += _options_table(ModelOptions2d(), "ModelOptions2d")
    lines += _options_table(ModelOptions3d(), "ModelOptions3d")
    open(os.path.join(out, "model_options.md"), "w").write(
        "\n".join(lines) + "\n")


MODULES = [
    "thetis_tpu.mesh.mesh2d", "thetis_tpu.mesh.generation",
    "thetis_tpu.mesh.gmsh", "thetis_tpu.mesh.extruded",
    "thetis_tpu.mesh.sphere",
    "thetis_tpu.fem.assembly", "thetis_tpu.fem.assembly3d",
    "thetis_tpu.fem.functionspace", "thetis_tpu.fem.rt",
    "thetis_tpu.fem.bdm",
    "thetis_tpu.equations.shallowwater_2d",
    "thetis_tpu.equations.shallowwater_dgcg",
    "thetis_tpu.equations.shallowwater_rtdg",
    "thetis_tpu.equations.tracer_2d", "thetis_tpu.equations.tracer_3d",
    "thetis_tpu.equations.momentum_3d", "thetis_tpu.equations.nh",
    "thetis_tpu.equations.sediment_2d", "thetis_tpu.equations.exner",
    "thetis_tpu.equations.turbulence",
    "thetis_tpu.equations.stability_functions",
    "thetis_tpu.equations.eos", "thetis_tpu.equations.utility3d",
    "thetis_tpu.equations.limiter",
    "thetis_tpu.timeintegration.steppers",
    "thetis_tpu.timeintegration.rungekutta",
    "thetis_tpu.timeintegration.implicitexplicit",
    "thetis_tpu.solvers.newton", "thetis_tpu.solvers.schur",
    "thetis_tpu.model.flowsolver2d", "thetis_tpu.model.flowsolver3d",
    "thetis_tpu.model.exporter", "thetis_tpu.model.callback",
    "thetis_tpu.model.diagnostics", "thetis_tpu.model.forcing",
    "thetis_tpu.model.turbines", "thetis_tpu.model.sediment_model",
    "thetis_tpu.model.optimisation",
    "thetis_tpu.adjoint.inversion_tools",
    "thetis_tpu.parallel.shard", "thetis_tpu.parallel.submesh",
    "thetis_tpu.parallel.sharded", "thetis_tpu.parallel.sharded3d",
    "thetis_tpu.utils.interpolation", "thetis_tpu.utils.netcdf_io",
    "thetis_tpu.utils.tides", "thetis_tpu.utils.coordsys",
    "thetis_tpu.utils.profiling",
]


def gen_api_docs(out):
    lines = ["# API reference", "",
             "Public modules with their responsibilities; every docstring "
             "cites the reference file:line it mirrors.", ""]
    for name in MODULES:
        mod = importlib.import_module(name)
        doc = inspect.getdoc(mod) or ""
        first = doc.split("\n\n")[0].replace("\n", " ")
        lines.append(f"## `{name}`")
        lines.append("")
        lines.append(first)
        public = getattr(mod, "__all__", None)
        if public:
            lines.append("")
            lines.append("Exports: " + ", ".join(f"`{p}`" for p in public))
        lines.append("")
    open(os.path.join(out, "api.md"), "w").write("\n".join(lines) + "\n")


if __name__ == "__main__":
    out = HERE
    gen_field_docs(out)
    gen_option_docs(out)
    gen_api_docs(out)
    print(f"wrote field_documentation.md, model_options.md, api.md to {out}")
