{ lib
, python3Packages
, fetchFromGitHub
, gcc
}:

python3Packages.buildPythonApplication rec {
  pname = "mp3rgain-tpu";
  version = "0.1.0";
  pyproject = true;

  src = fetchFromGitHub {
    owner = "mp3rgain-tpu";
    repo = "mp3rgain-tpu";
    rev = "v${version}";
    hash = "sha256-AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA=";
  };

  build-system = with python3Packages; [ setuptools ];

  dependencies = with python3Packages; [ numpy ];

  # The C++ host core builds lazily on first import; prebuild it here
  # so the installed package never shells out to a compiler.
  nativeBuildInputs = [ gcc ];
  postBuild = ''
    make native
  '';
  postInstall = ''
    site=$out/${python3Packages.python.sitePackages}
    cp mp3rgain_tpu/_native/*.so $site/mp3rgain_tpu/_native/
    installManPage docs/man/mp3rgain.1
  '';

  # Full suite needs jax + the virtual device mesh; run the
  # dependency-free host-parser tests.
  nativeCheckInputs = with python3Packages; [ pytestCheckHook ];
  pytestFlagsArray = [ "tests/test_bitstream.py" "tests/test_ape.py" ];

  meta = with lib; {
    description = "Lossless MP3 volume adjustment with TPU-accelerated ReplayGain analysis";
    homepage = "https://github.com/mp3rgain-tpu/mp3rgain-tpu";
    license = licenses.mit;
    maintainers = with maintainers; [ ];
    mainProgram = "mp3rgain";
    platforms = platforms.unix;
  };
}
