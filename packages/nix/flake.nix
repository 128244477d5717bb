{
  description = "mp3rgain-tpu: lossless MP3 volume adjustment with TPU-accelerated ReplayGain analysis";

  inputs = {
    nixpkgs.url = "github:NixOS/nixpkgs/nixos-unstable";
    flake-utils.url = "github:numtide/flake-utils";
  };

  outputs = { self, nixpkgs, flake-utils }:
    flake-utils.lib.eachDefaultSystem (system:
      let
        pkgs = nixpkgs.legacyPackages.${system};
      in
      {
        packages = rec {
          mp3rgain-tpu = pkgs.callPackage ./default.nix { };
          default = mp3rgain-tpu;
        };

        apps = rec {
          mp3rgain = flake-utils.lib.mkApp {
            drv = self.packages.${system}.mp3rgain-tpu;
            name = "mp3rgain";
          };
          default = mp3rgain;
        };

        devShells.default = pkgs.mkShell {
          packages = with pkgs; [
            (python3.withPackages (ps: with ps; [ numpy pytest ]))
            gcc
            gnumake
          ];
        };
      });
}
