"""Ouster-CLI plugin shim.

The reference registers its command group inside the ``ouster-cli`` tool
by shipping a module in the ``ouster.cli.plugins`` namespace package
(``src/ouster/cli/plugins/ptudes.py:1-4`` + ``setup.py:26``). ouster-cli
also discovers plugins through the ``ouster.cli.plugins`` entry-point
group, which is how this package registers (see ``pyproject.toml``) —
entry points compose with other installed plugins without owning a
namespace package. Importing this module exposes the click group under
the name ouster-cli expects.
"""
from ptudes_tpu.cli.main import ptudes_cli  # noqa: F401
