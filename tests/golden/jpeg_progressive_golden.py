"""Golden progressive-JPEG fixtures produced by an INDEPENDENT encoder.

Generated once by ``gen_jpeg_golden.c`` (this directory) against the
system libjpeg (libjpeg.so.62, IJG): three spec-distinct progressive
profiles — RGB 2x2-subsampled odd-dims q90, RGB unsubsampled q50, and
grayscale q75 — each with libjpeg's OWN decode of the same stream
(do_fancy_upsampling=FALSE, matching the repo decoder's replication
upsampling).  Closes the round-9 advisory: the in-repo encoder twin
can no longer hide a shared spec misunderstanding (AC-refinement ZRL,
EOB-run handling) because the expected pixels come from libjpeg.
"""

import base64

GOLDENS = {
    "rgb_q90_s22": {
        "shape": (29, 33, 3),
        "jpeg": base64.b64decode(
            "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAMCAgMCAgMDAwMEAwMEBQgFBQQEBQoHBwYIDAoM"
            "DAsKCwsNDhIQDQ4RDgsLEBYQERMUFRUVDA8XGBYUGBIUFRT/2wBDAQMEBAUEBQkFBQkUDQsN"
            "FBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBT/wgAR"
            "CAAdACEDASIAAhEBAxEB/8QAFwABAQEBAAAAAAAAAAAAAAAABQYAB//EABgBAQADAQAAAAAA"
            "AAAAAAAAAAUEBgcI/9oADAMBAAIQAxAAAAHhbL7Vohz7VCyJqsrrTGW4JhloziwZl5kzVJjW"
            "eOt3/8QAHBAAAgMAAwEAAAAAAAAAAAAAAwQAAQIRFCET/9oACAEBAAEFAgo+BTuBUu7CrzOr"
            "AqwSlcjUrnCdTozCdQaXgUfAp3OtMBrOsirGhrVnAlq4+Y5//8QAHhEAAgEDBQAAAAAAAAAA"
            "AAAAAAUBAgRRFBUhMbH/2gAIAQMBAT8BWsRax6NwjIsv6uBaxk1048P/xAAvEQABAQQFCgcA"
            "AAAAAAAAAAABAgADESEEFTFBYQUSIjJCUVNx0fCBkqGjssHS/9oACAECAQE/AX1NdwGafUd+"
            "WPObPqYQDp2Y9geMVNWj3d8/y1JyilJeKVsmB6Y8hBOLP3igoIAIlG6z6v1Z4zatDxh7vVv/"
            "xAAlEAACAQIFAwUAAAAAAAAAAAAAASESQQIRMmGhMTNSQoGCkqL/2gAIAQEABj8ChUohe7IW"
            "e7L4nweg6PE+DydsuhP1RMbI7ZMbI8UQqUQvkzX+SnkV27sq1MqcwaD/xAAeEAEAAgIDAQEB"
            "AAAAAAAAAAABABEhMUGB8FFh8f/aAAgBAQABPyFgfptxRlB3vmQbfQThHDUjz5luuDUjaGLR"
            "hMdn8DUJQAd3c93DUAHd3KjZ9w2xwfpt1FGUHe2eP4iUb5e4Oa1/CWW0VVmI95AkKwT0Z//a"
            "AAwDAQACAAMAAAAQIm8TB+//xAAfEQACAQQCAwAAAAAAAAAAAAAB8AARITFRYXGRsdH/2gAI"
            "AQMBAT8QLapXcGcl1aMp9lhByuTDADX2+Zyl1P/EABsRAQEBAQEBAQEAAAAAAAAAAAERIQBB"
            "MfDx/9oACAECAQE/EFI4fDA9IIIKVhStdnnyNNHAuX1PqPnYRO/A4yhKU+NQSR0B6yYjzoAM"
            "0TYOCXMBpVFPf1u//8QAJBAAAgICAgEDBQAAAAAAAAAAAREhMQBBUYFxYZHwscHR4fH/2gAI"
            "AQEAAT8QbO6UASGFOujvDYgCVUAb1uZ6wdMJJq+iWPpkQwiLCnDCj0sZ54XYBFhThhe1jCGQ"
            "wSBZ9qe6vQQhUFsuEmn5PPODwb3EkUDDdQwLz5fzgsG9zKAYbqGBeDFGgONjEoMi4Wj0yZ0o"
            "EQwpUdHeHxAEioA3rcz1nmye4TAEo4Bji1+MqKKTRmAPM8emEVMESQDA+2GvEEZAaXw58X65"
            "/9k="
        ),
        "libjpeg_pixels": base64.b64decode(
            "AAAzAAA5CQVCCgZDHwDAKADJNAl/PhOJTQyMTQyMSQI+RwA8XwCdZACibgWTcgmXgAOnhgmt"
            "nhZqhABQoAB0owB3rgDGtgDOuwC8xAXF1A942xZ/2QBd4AZk5wCP8AKY+QCUAwU+BQdADQlG"
            "GhZTKwLMMgnTKgB1JgBxNgB1QwKCUgtHWRJOagOocwyxcwqYYwCIjA+zdgCdigJWjwdbqwh/"
            "qgd+wQbZvgPWyAnJygvLwwBnyQRt2wFf4Qdl+gyi+w2j/wqfABNyBRl4FwfJHQ3PGg4mIRUt"
            "JwlHNxlXMghqQRd5QweLUhaabh2WbRyVaxM5bRU7hQ9MhA5LhA96jBeCohyhoRugwylpqhBQ"
            "uQ4gwhcpxw1Y0BZh6A7W6Q/X+x+B+h6A/x6MCx9+Ch59Hg7QJxfZJhoyLCA4MxVTPiBeSiCC"
            "SyGDVBicYiaqWAeAWQiBcxtBfiZMihRRlR9clB+KlyKNqiSplxGWrRNTshhYxxwuyR4w2yFs"
            "1x1o6A7W7hTc5Ahq7xN1+Ax6EjBuBCJgBiRYCSdbDiBoFylxLCOMMyqTSyl/UjCGSSEfTiYk"
            "WyNIaDBVYSByZCN1eSSmhzK0ojNmiRpNnR0cpycmqR9sryVyuyOqvSWs1i992zSC8y6a/jml"
            "5iE/7ilH+iKPAB5cAR9dES9jFjRoHS93HjB4MimSOjGaPx1zQyF3Vi4sYjo4WSFGZi5TdjWH"
            "dDOFiTS2bxqckiNWmClcqCgnqysqriRxvDJ/xS20yzO6xyBuzCVz2RSA4h2J7ShG9jFP/y2a"
            "ADeRATiSDi+yEjO2JS/FLznPOD+DQEeLNjJvOjZzRiqYUzelZjKxZzOydjWpezqufjdHeDFB"
            "hzJ1kDt+nDCdpDiluDOysy6tsDEewUIvxDBU0j5i2TNb3DZe9DKs+Tex/0N/ADeRDEOdGTq9"
            "IkPGLDbMMz3TKzJ2LzZ6QT16R0OAWT2rXUGvaze2cj69gD+zbCufgDlJkktbkTx/l0KFpzuo"
            "pjqnwDu6ykXEwUIvwkMw0z9j2ERo50Fp7EZu+zmz/Tu19TNvAUHFBUXJGFl3G1x6GEdbI1Jm"
            "JzuSNUmgQUWpPUGlWEu0XVC5TkUeXFMsa0pbbUxdg0lyg0lykUemlUuqqFtvkURYrUddq0Vb"
            "vENuwEdyyjyO10mb7lh771l85ksv6E0x/EU1Dk7SDU3RBkdlCktpG0peI1JmPFCnP1OqS0+z"
            "TFC0XVC5QjWeY1ozYlkydlVmfVxthUt0l12GlEqpoli3mEtfoFNns01jvFZsxUx3y1J93E6g"
            "41Wn1D5h3Udq7lM3+l9D/1BAAFYqAWA0AFZfC2JrIl7MIV3LOGuINmmGTW5bOltITFhEUV1J"
            "YlShZVeka1+dcWWjgme2fWKxh18ki2Moo01+r1mKtlbBtVXAu1nKw2HS1meI4XKT2lJg519t"
            "71Od81eh+lubBGM3CWg8EWhxEmlyI1/NJWHPI1ZzKVx5O1xJQWJPXmpWUV1Jc2Wyd2m2em6s"
            "Y1eVgWa1c1inkWkuj2csuWOUsVuMwWHMwmLNyGbXyWfYw1R1yFl65l5s+HB++l6o/mKs/2Sk"
            "AGi2A227FXZtHn92M3uJO4ORKWxBLG9EOGiZPGydUHCrWHizW2aTb3qnfnx/YV9iiWyLhWiH"
            "gWari3C1mG+9nXTCt3iAwIGJtWFJynZez2ao0Gep4W2e4Gyd826d+nWk+W4tCXPBD3nHB2hf"
            "Dm9mGGBuIGh2LnFGNXhNTX2uTn6vVXWwQmKddYCtVF+MamhreHZ5hmmIkXSTlHm+nYLHoHfF"
            "pn3Lq2x0pmdv0n5mznpi1Gut3HO17Hip6nan/3uq7WiX/3c2AHgjBoYxBnlOE4ZbF3lsG31w"
            "M3ycOYKiRn+GUYqRU4k1SoAsWYA/WoFAaXuHbH6KhIavhYewmpJkh39Rk3grmH0wqn1etYhp"
            "uHSxwn6724yI5ZaS54ha2XpM7oVE5Xw7+n6WCoo1BoYxGItgGItgJYd6LpCDOYKiPoenPHV8"
            "RX6FT4UxW5E9Y4pJaZBPd4mVd4mVh4myenyljIRWjIRWpYo9rZJFsYRluItszorH0IzJxXZy"
            "zH154oNV4oNV8YhH945N/4mhAIxkAJNrA4aiDpGtJaCBKKOEKJQvJ5MuO45GP5JKS4aATYiC"
            "apSgbpikfaNyY4lYdo0bfZQiiZNMipRNoIbDqY/Mt51swad20Jmf0JmfzJQ1yJAx4YyF5pGK"
            "8pKg+Jim+ZDTA5hwCp93Fpm1HJ+7DolqGJN0Mp45PalER5pSSJtTXpmTZqGbcJqmWYOPbpRj"
            "cZdmh54siJ8tkJpTnKZfrJLPspjVrJJhqI5duIGHxo+V1Jw93KRF7JeQ9aCZ95el54eV/5ve"
            "AJ/IA6bPGq5yJrp+HJdgKKNsLJuVMaCaN5ioQ6S0WKKTX6maYaM/X6E9Z51sb6V0d5+EfqaL"
            "kJjJlp7PkaEdmKgkoJhNsKhdrZ1fvKxuv5eiz6ey67KX6bCV6KU86aY9+qE9DK/YC67XCJxg"
            "EKRoK6ZvO7Z/OaiiQK+pS6y8Tq+/aLKjS5WGa61JaatHgbeGea9+h6+Uh6+Um6PUpKzdorIu"
            "qLg0sqpfvrZrxbV3xrZ40Kiz37fC1ZyB1ZyB8K1E+7hP/65KAKtNCbxeBraQC7uVGbyhFrme"
            "NbWePr6nNq03Q7pESbJwVL17WLJ+YryIaaivdbS7lcFgh7NSia5ojLFrkq1mmrVurq6UtLSa"
            "z7p31sF+za8r0rQw3rgp68U25a+B57GD9rfKEcRmDL9hC7uVFMSeIsWqHsGmQMCpLq6XScBK"
            "S8JMUrt5Vb58ZsCMasSQeLe+icjPh7NSiLRTmb54ncJ8pcB5p8J7urqgwsKoxK9sx7Jv2rw4"
            "5cdD3LYn6cM0+cOV+MKU/8LVAMDAAMvLHdeOJd+WLNJWH8VJL9FIJcc+McOcPtCpTtGnUdSq"
            "aMywa8+zYsYlYsYlesmHe8qIisCwj8W1osLBrc3Mt9CMwNmVtcdjuctnw8CL0M2Y4sax48ey"
            "8smt986y/cQ1BNLSCdfXBsB3CcN6JMpOJsxQMdNKNNZNQtStP9GqWdyyPL+VbNC0XMCkcdU0"
            "c9c2fs2LitmXmM6+odfHqsrJsNDPqsN/rseDv9Ftxddz19Sf29ij6My37tK9/NO36L+j/9BB"
            "CuCkDeOnCeM0Bd8wGtSXINqdM+KXNOOYSN64Rty2ZfZZR9g7Vs9ma+R7ZtG1b9q+fNS+ht7I"
            "keSIlOeLmt5Vmt5VqtONstuVu9WWw92e1uGp0dyk1t9G1t9G5Npf6+Fm9tp3AticANOXDOY3"
            "E+0+KeOmM+2wNOOYKNeMS+G7OtCqTt9CVOVIcOmAbeZ9cNu/funNh9/Jh9/Jh9p+it2Bn+Na"
            "qe1kt+CavuehyuSlzuip1uGpydSc1N1E4+xT9uxx9uxx/+SBAORhAPBtEeufEeufM/SLNfaN"
            "L+Q9NepDMuZPQfVePfF2PPB1Zu2za/K4jvdmeuNSd+Qzg/A/hedgjO5nnOanpe+wtu2Sw/qf"
            "0/hbxepN0OQ12+9A5+Kq6eSs7+6c9fSi+e3dBfl2B/t4HPaqHPaqIuN6KOmAPPFKP/RNRfli"
            "RPhhQ/d8U/+McPe9WN+lfOVUgutag/A/jfpJkPJrmvx1r/m6sfu8reSJr+aLx+xPye5R2+9A"
            "5PhJ8ey0+/a++vmn6eiW//fnBvPpE//2DP4eDf8fI/8dJf8fK/5XNf9hQPXCTP/OZf+JUfR1"
            "YPsbZP8fcP9Dcv9Fd/+Tf/+bj/jZk/zdsfvusfvuo/8cp/8gtvp/v/+IzfnI0PzL4fm97P/I"
            "+/+O4vJ1//9V"
        ),
    },
    "rgb_q50_s11": {
        "shape": (16, 24, 3),
        "jpeg": base64.b64decode(
            "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDABALDA4MChAODQ4SERATGCgaGBYWGDEjJR0oOjM9"
            "PDkzODdASFxOQERXRTc4UG1RV19iZ2hnPk1xeXBkeFxlZ2P/2wBDARESEhgVGC8aGi9jQjhC"
            "Y2NjY2NjY2NjY2NjY2NjY2NjY2NjY2NjY2NjY2NjY2NjY2NjY2NjY2NjY2NjY2NjY2P/wgAR"
            "CAAQABgDAREAAhEBAxEB/8QAFQABAQAAAAAAAAAAAAAAAAAAAwX/xAAXAQEBAQEAAAAAAAAA"
            "AAAAAAAEAwIG/9oADAMBAAIQAxAAAAGcmbzU01vjnWmp8K//xAAXEAADAQAAAAAAAAAAAAAA"
            "AAAAAQID/9oACAEBAAEFAlmKBQKBQKD/xAAWEQEBAQAAAAAAAAAAAAAAAAACAAP/2gAIAQMB"
            "AT8BOkXFxcHB3//EAB0RAAICAgMBAAAAAAAAAAAAAAABAiEREhNBcYH/2gAIAQIBAT8By8VR"
            "s+jdt0cn0c16Sms2f//EABQQAQAAAAAAAAAAAAAAAAAAACD/2gAIAQEABj8CX//EABgQAQAD"
            "AQAAAAAAAAAAAAAAAAARYYFR/9oACAEBAAE/IaoVq27V1f/aAAwDAQACAAMAAAAQBw//AP/E"
            "ABYRAQEBAAAAAAAAAAAAAAAAABBRAP/aAAgBAwEBPxAu7sd//8QAIREAAgECBwEBAAAAAAAA"
            "AAAAARFBADEhUXGRscHwYeH/2gAIAQIBAT8QRAze2m9PBMrk3/PWq2WTJ6HHFY7MoYw64p4s"
            "tCt7Oeg0N/BEb61//8QAHBABAAICAwEAAAAAAAAAAAAAAQARIUExUWFx/9oACAEBAAE/EFoq"
            "juLr6XmKuLPbLOBWrMQ7yW1RiHeF+BP/2Q=="
        ),
        "libjpeg_pixels": base64.b64decode(
            "AAYAAABhDQBeHARYKQCkOACnRQCvUAD/awD/YwCvYAgwaAoYfAFrjwCqnQSqogegzAPOygDm"
            "yACNyAc80ABg3ANr5wxq8AWsABIjCBU3Fxw5JBVmLwS2NwSfPxZCRR8UVQGNXBkgayIcfheC"
            "kAzcmwH/ngjJniArugDpvhdFxB8dzxRb3BJ46gu09gXq/A3LCRagEyCTHyCsKiCnMCVnNCFO"
            "OR1NPSEtUSkAYB9fdCl8iCqikxvumR60myxMniZWrSFGtSc9xSRy2COW5yGs9RD//BLl/zA+"
            "BzVzDzZ3GSPnIhv/KS5/MTFVOS5oQTsrYjaBbDx2dC3Heim0fj8Uhz8FlTRfoj5Yrj1RtjaA"
            "xTSd1SrR5CTZ7ztG9UUA9y9JADO9BE41DFQUFVAYH1IDL0RfPTu4SkyFZEOsaD3KbExhbk8W"
            "cjxMgEA+lFApokuCsUyEtzXvwD6qzFcS2FYC5Ewd70cs9D5VAFdTAF05CVpUE1J1IVN4MVGe"
            "QlTETmGwU1RPW18sZ1hvdFGRf1xWjFZ2lk60nliOskvBtWQvu2MbxVZL010t5F4581WF/FWd"
            "AGVzBl2+E17RIma5LGetN2mcQme4SVr/VXgAXGVgaWGUe2WljWbBmW2inmyPn1vIt281u3Av"
            "wGRnzWN522tp62O4+GDn/3aXAnpeD3KzIH6yMH7JOGr/PXDMP4U8QoQta3Wyanh4bXVqe2+X"
            "jmzLnWzho3Ovon5ewXk+xWmazWqg1nOF43eP8IF6+Xuq/WL/CImfEobPIIXvJofMKop/Lo1J"
            "N4xLPopkVIClX45+bommdX3FfIpNhIY7kIFgmYRnp5Vxroufu5Nwy33T2n6v55Mj74Fe9IJO"
            "C5CvDpKfFJV/HJhaKJpSOpl7TpXLWpL/aZ+pa5DgbpKqdKkDf5NUkJVfopeDrp6Eu6mBvpHu"
            "xZmq0ZqF3qBN66M0+JKQ/51WBLsABbcACq4RGaVPLJ+aP57OTaHdVKTZYKWgYaWAZbcAcaFn"
            "hKGFmKGmqLVZrqDRvJ3ZvaGwwrkWzLcQ2aZv6ZvC+Z7b/7xaA6i8CK+RFLpyJ8CAOsGhQr6a"
            "PrxZOLsXTbNFU8IAYrNne79qk7HtorTipqb+ob5Hs6+At7lOv74uy7Ru27SX6r2W+rnX/7P/"
            "ENONE9GTHcm5LMP8Pb7/QcDzPMd2M84IWsqPX812bNZcgcTel9mbo7//osijntUguMxrvs9p"
            "yMep1cTM48+u8NqF99ea/MX8DNLdC9ifDt9QFuUjJOgkMuc6PeRMQuRTbdH/a93Va96RcuNL"
            "gMjEjeUxl+cknd1TuNuzv9jFyND01eKc3+R96Nmi6+RO7+ctAP0AAfoAB/QQEPAWHvAfL/A9"
            "QvJzT/KfZPKoZtz/aOuBbPEodu4QhN9ol+9Bo/BksvKbtuu1v9n8y/Fo2PwS4+9H7fMh8uhV"
            "APM9CfN2G/WpKfioM/yIQP2FTfu2WfbrUf0bXv8Ab/9Xfvx/if9Wlf9MpfapsfqzsfLqtv8s"
            "vv8dyv8D3f9B8fSJ//9F//mY"
        ),
    },
    "gray_q75": {
        "shape": (17, 24, 1),
        "jpeg": base64.b64decode(
            "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8UHRof"
            "Hh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/wgALCAARABgBAREA/8QAFwAB"
            "AAMAAAAAAAAAAAAAAAAABgIEBf/aAAgBAQAAAAE8sq5KwvJaG//EABwQAAICAgMAAAAAAAAA"
            "AAAAAAACBBIBBQMTNP/aAAgBAQABBQKOtCOtDcv1pHWhHWhsOS+xhkMz7//EACIQAAECAwkA"
            "AAAAAAAAAAAAAAECEAMRIQAEEiIxUXOx8P/aAAgBAQAGPwJoEGhmcR39q6pVCMj3jkV3b//E"
            "AB4QAAIDAAEFAAAAAAAAAAAAAAABESFBMVGBkaHw/9oACAEBAAE/IaOyUdkgRzSsRS7X4FHZ"
            "KOyJRgkkaUcc+2zRo+N1H//aAAgBAQAAABAi/wD/xAAdEAACAQUBAQAAAAAAAAAAAAABEQAx"
            "QaHB8SEQ/9oACAEBAAE/ELbjS7LbjS7Kuz0k2p+FeHp8UMtuNLstuNLsKycMG3LupA7CCArU"
            "6tzVv4b/AP/Z"
        ),
        "libjpeg_pixels": base64.b64decode(
            "AAsbHUpMXGpVY3N1oqS0wrC018fzKR81Bg8cIExRXWdeZ3R4pKm1v7u8wNj5Dyk6Bg4bJk5Z"
            "Zm5eZnN+prG+xq/Dzd33LjMwDhckMkhVY2xmb3yKoK27xLu81eQOHjE7Ii05QT1FUlx6hZGZ"
            "lZ2qtNXf9vMAHRcpKjZDTTdBT1qCjpulj5mnsujs4uohAA8oKjRCUzlKV2GCjJqrkaKvudLb"
            "/f8AETAoMzhDVjpOWF6LkJuukqawtujq9BUWEiYoFSMzNWJkdIJte4uNurzM2sjM2ggvJUhR"
            "Hic0OGRpdX92f4yQvMHN19Hd4AQ6PUBAHiYzPmZxfoZ2fouWvsnW3snJ7wkeM1VNJi88SmBt"
            "e4R+h5SiuMXT3NHxABQ+QkFOOkVRWVVdanSSnamxrbXCzO/tLCcWGDdHQk5bZU9ZZ3KaprO9"
            "p7G/yur5JysfMio6Qkxaa1Fib3mapLLDqbrH0fkiFiozKzNTS1BbblJmcHajqLPGqr7IzvAl"
            "I0IXKUU/MThHT3d/jpWKkaCo0Njn7uIDFBpBSllh"
        ),
    },
}
