from ekf_vio_tpu.cli import main

raise SystemExit(main())
