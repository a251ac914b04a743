"""docs/OPERATORS.md durability: the API index must name every public
function in the package (r7 verdict #7: "every public operator
reachable from one index page" — this test keeps that true as the
package grows). Pure-AST, no Spark session."""

import ast
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
PKG = ROOT / "projet_big_data_boutin_danre_spark"


def public_functions():
    for f in sorted(PKG.rglob("*.py")):
        tree = ast.parse(f.read_text())
        for node in tree.body:
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef)
            ) and not node.name.startswith("_"):
                yield f.relative_to(ROOT), node.name


def test_every_public_function_is_in_the_operator_index():
    doc = (ROOT / "docs" / "OPERATORS.md").read_text()
    missing = [
        f"{path}:{name}"
        for path, name in public_functions()
        if name not in doc
    ]
    assert not missing, (
        "public functions absent from docs/OPERATORS.md — add them to "
        "the relevant table or the 'Building blocks & variants' "
        f"section:\n" + "\n".join(missing)
    )


def test_index_names_every_query_slot():
    """Every queries() slot name should appear in the index too, so a
    new slot can't ship without its documentation row."""
    import json

    doc = (ROOT / "docs" / "OPERATORS.md").read_text()
    # slot names from the last recorded correctness run — stable
    # across rounds (the 50-slot cap) and available without a Spark
    # session
    runs = sorted(ROOT.glob("CORRECTNESS_r*.json"))
    assert runs, "no CORRECTNESS_r*.json present"
    slots = json.loads(runs[-1].read_text())
    missing = [s for s in slots if s not in doc]
    assert not missing, f"slots absent from docs/OPERATORS.md: {missing}"
