from cudapathtracer_tpu.cli import main

raise SystemExit(main())
