"""Streaming inference server entrypoint (reference: app/server.py:55-58).

Thin wrapper over chemeleon_tpu.serve.server (stdlib HTTP; LitServe is not
required). ``python app/server.py`` serves POST /predict on port 8000.
"""

from chemeleon_tpu.serve.server import main

if __name__ == "__main__":
    main()
