"""``python -m treee_tpu`` == ``python -m treee_tpu.app`` (main.rs entry)."""

from .app import main

if __name__ == "__main__":
    raise SystemExit(main())
