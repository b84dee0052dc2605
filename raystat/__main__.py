from raystat.cli import main

raise SystemExit(main())
