"""Generate + execute the example notebooks from examples/*.py.

The reference ships executable notebooks run by CI via papermill
(reference run_tests.yml:93-99, examples/{BaseOptimization,
Optimization}.ipynb); this repo keeps the examples as plain .py
(the single source of truth) and derives executed .ipynb twins from
them: the module docstring and each contiguous ``#``-comment block
become markdown cells, the code between them code cells.

Usage::

    TNCO_TPU_PLATFORM=cpu python scripts/make_notebooks.py [--no-exec]
"""

import argparse
import os
import sys

import nbformat

EXAMPLES = {
    'base_optimization.py': 'BaseOptimization.ipynb',
    'optimization.py': 'Optimization.ipynb',
    'sampling.py': 'Sampling.ipynb',
}

# Mirrors the CLI's platform override (sitecustomize pins
# JAX_PLATFORMS to the tunneled TPU; CI executes on CPU).
PLATFORM_CELL = """\
import os

if os.environ.get('TNCO_TPU_PLATFORM'):
    import jax
    jax.config.update('jax_platforms', os.environ['TNCO_TPU_PLATFORM'])
"""


def _split_cells(source: str):
    """Yield ('markdown'|'code', text) cells from an example script."""
    lines = source.splitlines()
    i = 0
    # Module docstring -> title markdown cell.
    if lines and lines[0].startswith('"""'):
        doc = [lines[0][3:]]
        i = 1
        while i < len(lines) and not lines[i - 1].rstrip().endswith('"""'):
            doc.append(lines[i])
            i += 1
        text = '\n'.join(doc).rstrip().removesuffix('"""').rstrip()
        title, _, rest = text.partition('\n')
        yield 'markdown', f'# {title.strip()}\n{rest.strip()}'
    cells = []  # (kind, [lines])
    for line in lines[i:]:
        is_comment = line.startswith('# ')
        if is_comment:
            if cells and cells[-1][0] == 'markdown':
                cells[-1][1].append(line[2:])
            else:
                cells.append(('markdown', [line[2:]]))
        elif line.strip() or (cells and cells[-1][0] == 'code'):
            if cells and cells[-1][0] == 'code':
                cells[-1][1].append(line)
            else:
                cells.append(('code', [line]))
    for kind, body in cells:
        text = '\n'.join(body).strip('\n')
        if text:
            yield kind, text


def build_notebook(py_path: str) -> nbformat.NotebookNode:
    nb = nbformat.v4.new_notebook()
    nb.metadata['kernelspec'] = {
        'name': 'python3', 'language': 'python', 'display_name': 'Python 3'}
    nb.cells.append(nbformat.v4.new_code_cell(PLATFORM_CELL.rstrip()))
    with open(py_path) as f:
        for kind, text in _split_cells(f.read()):
            if kind == 'markdown':
                nb.cells.append(nbformat.v4.new_markdown_cell(text))
            else:
                nb.cells.append(nbformat.v4.new_code_cell(text))
    return nb


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--no-exec', action='store_true',
                    help='write unexecuted notebooks (no kernel run)')
    ap.add_argument('--examples-dir', default='examples')
    args = ap.parse_args()

    os.environ.setdefault('TNCO_TPU_PLATFORM', 'cpu')
    failures = 0
    for py_name, nb_name in EXAMPLES.items():
        py_path = os.path.join(args.examples_dir, py_name)
        nb_path = os.path.join(args.examples_dir, nb_name)
        if not os.path.exists(py_path):
            print(f'skip {py_name} (missing)')
            continue
        nb = build_notebook(py_path)
        if not args.no_exec:
            from nbclient import NotebookClient
            # Kernel cwd = repo root so ``tnco_tpu`` resolves exactly as
            # it does for ``python examples/foo.py``.
            client = NotebookClient(nb, timeout=600,
                                    kernel_name='python3',
                                    resources={'metadata': {'path': '.'}})
            try:
                client.execute()
            except Exception as exc:  # keep going; report at exit
                failures += 1
                print(f'EXEC FAILED {py_name}: {exc}', file=sys.stderr)
        nbformat.write(nb, nb_path)
        n_code = sum(c.cell_type == 'code' for c in nb.cells)
        print(f'{nb_path}: {len(nb.cells)} cells ({n_code} code)'
              + ('' if args.no_exec else ', executed'))
    sys.exit(1 if failures else 0)


if __name__ == '__main__':
    main()
