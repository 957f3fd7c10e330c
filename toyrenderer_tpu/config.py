"""Self-registering typed command-line options.

Counterpart of the reference's config system (CommandLineOption<T> static
registries wired into cxxopts at startup, source/Engine.h:82-102 +
Engine.cpp:147-187): modules declare `Option(...)` at import time; any tool
calls `parse_args()` to materialize every registered option into argparse
and populate the values.  Runtime-tweakable render settings remain fields
of RenderSettings (the reference's imgui-mutable Scene booleans).
"""

from __future__ import annotations

import argparse
from typing import Any

_REGISTRY: dict[str, "Option"] = {}


class Option:
    """A typed CLI option, registered globally at construction."""

    def __init__(self, name: str, default: Any, help: str = "",
                 choices=None):
        if name in _REGISTRY and _REGISTRY[name].default != default:
            raise ValueError(f"option '{name}' registered twice")
        self.name = name
        self.default = default
        self.help = help
        self.choices = choices
        self.value = default
        _REGISTRY[name] = self

    def get(self):
        return self.value


def option(name: str, default: Any, help: str = "", **kw) -> Option:
    """Declare-or-fetch an option (idempotent for the same default)."""
    if name in _REGISTRY:
        return _REGISTRY[name]
    return Option(name, default, help=help, **kw)


def all_options() -> dict[str, Option]:
    return dict(_REGISTRY)


def build_parser(parser: argparse.ArgumentParser | None = None):
    parser = parser or argparse.ArgumentParser()
    for name, opt in sorted(_REGISTRY.items()):
        flag = f"--{name}"
        if isinstance(opt.default, bool):
            parser.add_argument(flag, action="store_true",
                                default=opt.default, help=opt.help)
        else:
            parser.add_argument(flag, type=type(opt.default),
                                default=opt.default, help=opt.help,
                                choices=opt.choices)
    return parser


def parse_args(argv=None, parser=None):
    """Parse argv, write values back into the registry, return namespace."""
    parser = build_parser(parser)
    ns, _ = parser.parse_known_args(argv)
    for name, opt in _REGISTRY.items():
        if hasattr(ns, name):
            opt.value = getattr(ns, name)
    return ns
