"""EXTERNAL golden JPEG fixtures — GENERATED, do not edit.

Produced by scripts/gen_jpeg_golden.py using the JDK's
javax.imageio JPEG codec (an implementation independent of
fourmc_spark.operators.jpeg): `jpeg_b85` are JPEG bytes the
JDK ENCODER emitted, `pixels_b85` the RGB array the JDK
DECODER produced for those same bytes. A complementary bug
pair in our encoder+decoder cannot cancel against these.
"""

import base64
import zlib


def _unpack(s: str) -> bytes:
    return zlib.decompress(base64.b85decode(s))


FIXTURES = [
    dict(
        name='gray_gradient_16x24', w=24, h=16, gray=True, quality=0.9,
        jdk_vs_source_maxdiff=1,
        jpeg_b85=(
    "c-s4a<NpH&0WUXCHwH!~1_nkTWcYuZ!I^=Xi3x;&fCY$HIapa)SXjB(+1WUFxOjNDxwy"
    "G``Gf>``2_j6xdp@o1cgOJMMZh|#U;c<B!omnMgAXP;O1ZuV31&B6lC~+gh3u?I4dI<F"
    "hBt#6VPBbb`DN1ZlHp#0t`%y%*;$I%pj|Pvb8{Y1{Oh9Aw@$+HsQcTcBMiQqsEB~Ih36"
    "?9uy6__(8=usi=vQOH5osQc6`#T|-mL#MI2(!qUpw#nsK-!_zA`Bs45MA~GsDB{eNQBQ"
    "vYGq_nKOqOz*FrM0cSqqA$$<SA39O`kDy)}qBrmM&YqV&$q$o40J;wtdIWU55@IIeP5)"
    "iIb-;UA}Vl+VvYZZ#{hU_{q~}&tJTJ_3_i^FJHfX|MBzJ|62?kAph7i{K!6J&;RfFyZ;"
    "Pc-_~>dvHv}P_h0Q>f0RG`XLwil{>ys%5B-P#Gwl4m|I*&|SXBPM2>?8BjYR"
),
        pixels_b85=(
    "c-lSE_bUW&7{~GZK`Dv|kz|I1v(DbKIeVVH_c;5^bJp2gwzJ0>>BvkMp%ZmV`N1FKQ%`"
    ";WgU|c*JRA;3LqkJLOG{T**TBHQ#Kgqh+}zsQ+TPyY(b3V(&CScp%irHWBqSs<GBP$cH"
    "Zd_VH8nLmJ3Bu=zoew3va+(izP_ocNmEl(TU%RCPtVB6$kf!-!otGV*4Dwnfy?E(ySw}"
    "N_yh(9hJ}SiMMd%X{N&{1jEoF{Ku}m%SXNe6U0vPK(9qi2DiVowbaeFf^^J{<&CJZKtg"
    "P(p?3|pOTwPr~Jw1JWeS?F8!^6X4Vqy{!5-=k(GczwQuc)Y~qN1X<wpJ(<wzai&cXx}$"
    "VnahiYO%4gL5s7qGiIPAARquO5fKq_adBu#OH0EHw3L>XQcH7lb9;MxPfw3TA{ibY#tc"
    "hKOU!_Vi;D|p`1$z-1qES7baXUYXhv>sZgFvOd3iZzG&VM(rK_u}udi=#aBysFY-(zXW"
    "}t<UhK7b>21wC@8H}{5s;aK84y4r5-`|fJ<KyGAv$Knfiy%ddhld9v#f<p)c#x*2r|0D"
    "4FjCBDX=wo|S_TFNq*CeR<mBAk-174B`uaLZc|0Ck7%5#gD=Ujy7%4Q+0#a(3o}OM<SX"
    "fzE+1lFL-QD%}_NErR2S}5WlIXGp1qIYXq#Yd{y}i949T^#+mZhbowY4>wOm=W^aB^}2"
    "QfdKdN=gd5EJ&#Zq@A6eARQVS8XX-4DYa~DZ0zjp93CE?ot<4?UV@Zb7%5#Aq}0MlCnh"
    "FlW@bQ2Eqi-=$H&L#=jRHA;^yWCq|^dZv=Av;KuRqjMGKLl1*B-%-`|(Z<rfzhS65f}_"
    "xDdvPnZExv_OMM*=0dWmjx+itgfzZZf;`6(a{lFXvX8?<MZ?L+uIxaQbx)yiy3HPq}$u"
    "um;q9>V8-3u9cH||yr@*FudgqVqNS#$hLO@`L5i07`FTc)8K<YGAici6et39LDwVIVuO"
    "A;DYPI_3=Le+J!bs_|AjNy2g^@x7Ew{I~)bjrR{`vX&{r&y>`}_Cz_YdsV?+^"
),
    ),
    dict(
        name='gray_noise_17x13', w=13, h=17, gray=True, quality=0.7,
        jdk_vs_source_maxdiff=32,
        jpeg_b85=(
    "c-jHt0UiGT*#F=F5K2Z#MgRc<000310RRC1+W<oV3I_)W2L=iV2nY)b3JVSx5DpCu4jm"
    "O15f~#MB_tvrA|WO#H!mhBG$|n>FhMaiIXgZ+J|!+hNkcqHH$6T(|G)qX2mlcP4FLfW0"
    "RO}Q9{>OW1pxs80RaI300000000010s{mE1_uZU3Jd?l0JRVR0s#X90t5pE1q1{D00Dg"
    "g0s{a95d{(<F+m0sQDFxnaTGFvk)a49Lb1UWQqk}vGh%Xr2?`b$7#SKRCMPH<Dl|1VH#"
    "j*uLqtVJM@UIZQ&d$}S6EqEV`OD!XJ~0^b98lfcX)YvgM@{Khlq)al9QB`mY0~Bnxdnm"
    "rKYE-sj9NGw6(UkxVgH*!^FkL$H>Xb($mz{*4NnC+Tr5k<mKk)=;`Y5^7Hid_V@Vt`v2"
    "Mh2mt{A06ze!p<Y8`8Y$Z5?n4kV+!Kg6kVu<zwMiRgmm~r{Z@q#I?M}x~ySrtE<L!{!l"
    "L|N5BVC(LHnY5JUB>{P1_GR%oEC<_{LGDWthf61j_AUQ;1*@xy$;L(KK3F#8A_b{xGyy"
    "2ju;uVY!(V8zjaBY&Q*rofa4@OjseC1&1BF203#NS{{UW){{ZO}RRz!dgDk(`f6Q0^*~"
    "FEz+W"
),
        pixels_b85=(
    "c-jq;KS+X66vf3B5sK6jF-SDXNJJXUG$9QWAp}K{FeHZpa|#Vg$SLx32~ki}%p_9$H%K"
    "H%R2m4jR8Uw$N=wmT4K<h$VrThy?{V(AzkBXS5X9){=*!Csm&>i!>+N=XczF2c=B84q{"
    "QmyN<MBiyVX;_DCX?N6UtL}8@9!TP8v6M7*xcN_zP_f@=@36ZKZnC%f*?pF5{*WK;PUd"
    ")<M9-W#rOC3y}iBt{e7KIcXV__rBX*mM)-XG?(VL^V7R@#-P+pv`ubX1Tf4Zp`1|`ao6"
    "TyqTCdk%U0p#27?{^;HHk!m@^ZPH$z)DWP6B~|OeVuS1l4MFV`Bq8fWa)d0>kZggW>b@"
    "^X=`8$K$zNuBD|VFi%WO3=9l_0WV-aJUr}nyO=8$i@`si&x=H&_4Rcq=jZ2Jt=8b+AjV"
    "{~*>Iblo;DhdjYb2p<Z`(}p+F{+AzoNmK)Ylz`SkQOHa4bEC{n2uMn;C9-QM1|*=&o8i"
    "yDmv<%p5NV63dHKq(Xo#bWWy%nYJKZb(C`)gpvwG#ZISn$70i+#J5Zn4O&k|K#K(tiHd"
    "$Pft(p?(RUIPNyFp9$sHxVRe3fjwGS%>+3`7QmF)tUaz;jybMU}7m*?vbjK{vd%a%dj2"
    "+<}RVYF7!C-J|Y6_4n77GhHJ3DhaoiIUbpU=l+GLa0fp-{;0_jfv-<Ktt2K!9~*vssjk"
    "kB=*r%KQ6!i~}CD!1>_d06*B{<0FT|fy2+w54K>nT5+aOC_6hlh)61xs#Ge6!-1<@F8>"
    "F@Dn8Z"
),
    ),
    dict(
        name='rgb_constant_16x16', w=16, h=16, gray=False, quality=0.9,
        jdk_vs_source_maxdiff=1,
        jpeg_b85=(
    "c-s4a<NpH&0WUXCHwH!~1_nkTWcYuZ!I^=Xi3x;&fCY$HIapa)SXjB(+1WUFxOjNDxwy"
    "G``Gf>``2_j6xdp@o1cgOJMMZh|#U;c<B!omnML>oyG6VInuyV4pa*FVB^NNrR{vTiv<"
    "X{kB5MX9hVqg+vWEN!ne}q9E=uTEfFkpZJMkb&e+1NQaxwwG}whAyXF)}kVu`q*N4V0|"
    "~$}_MCvI;30I<g4|CbBCPiWoIcT*#s9wDF*5(8Uib#z{p@oLpk!5|UD?YU&!AS|+Au<`"
    "$M#&MvNQ?jD|A!6Bhx;SrHh$tkI6=^2?>#U-U><rS4x%`L5M?H!$6lO|7@I&J!lnX?ux"
    "Ub1xA@)avrZQ8tL>$dGXcJ4ZK_{h;?$4{I*b?NeztJkjIxOwa0qsLF4K70P+<*SdMK7a"
    "Z8?fZ|Pzd-(CWMF250j&NK1p14Kg@u`g9po=YrgD%1K^9g;LpCADK=#B!VI`wR4iTq`3"
    "pXC*R5lL!AevNkkxNX)<e}<Ekk`OIBhF(@Wcdv4F@(QvG4L=m0wa%Ekinke{Gu-H56Yi"
    "D|Gx<UH;u(!"
),
        pixels_b85=(
    "c-jkCpdK)aM$t$`08kAV5C"
),
    ),
    dict(
        name='rgb_gradient_32x24', w=24, h=32, gray=False, quality=0.9,
        jdk_vs_source_maxdiff=4,
        jpeg_b85=(
    "c-s4a<NpH&0WUXCHwH!~1_nkTWcYuZ!I^=Xi3x;&fCY$HIapa)SXjB(+1WUFxOjNDxwy"
    "G``Gf>``2_j6xdp@o1cgOJMMZh|#U;c<B!omnML>oyG6VInuyV4pa*FVB^NNrR{vTiv<"
    "X})>kYHw1Vqg+vWEN!ne}q9E=uTEfFkpZJMkb&e+1NQaxwwG}whAyXF)}kVu`q*N4V0|"
    "~$}_MCvI;30I<g4|CbBCPiWoIcT*#s9wDF*5(8Uib#z{p@oLpk!5|UD?YU&!AS|+Au<`"
    "$M#&MvNQ?jD|A!6Bhx;SrHh$tkI6=^2?>#U-U><rS4x%`L5M?H!$6lO|7@I&J!lnX?ux"
    "Ub1xA@)avrZQ8tL>$dGXcJ4ZK_{h;?$4{I*b?NeztJkjIxOwa0qsLF4K70P+<*SdMK7a"
    "Z8?fZ|Pzd-(CWMF250j&NK1p14Kg@u`g9po=YrgD%1K^9g;LpCADK=#B!VI`wR4iTq`3"
    "pXC*R5lL!AevNkkxNX)<e}<Ekk`OIBhF(@Wcdv4F@(QvG4L=m0wa%Ekinke&-DvAb?-%"
    "A?Beae`)KD{w&U+U#`P|^@%Ntg)`#b8uIt}-UJ6nm67CEV)L1i@`O_M|_}|ADKAHv6u~"
    "*u0<L^D;reGZxw@AzHK3eO&pgtgNXWcJZz2@Za6^nMsf(&&{`tbZ|#G3uz`<?&a1OQRQ"
    "1k3"
),
        pixels_b85=(
    "c-jTQ30K+(0svrx-~n2&h6+dl2}&qIASj1KO*jH3AORC3T;T{p5V=G|vA(u*wA0Q#J3B"
    "kGZ+GABFWv8302UVHi-2-j_CmR^xh~UhESO#bkQT7(0Aw3L&4Ay!5Z+zDVIYnGlpA1t3"
    "m1nnKD1E9fX3-UC%SMGlZ_HGnQT!Zmn&D~nzcpn#iHS*-27@0dL@Sqi->U%wJiD}8Me1"
    "byphLUa>^rT4&-b=&L7EzlSPqOlw$HeDIX=}GR4x;%Cc&0S)*P7UoIQK74z1T&9Dr=UU"
    "pelP}@qtzKp$Dj_j|H?o|q1VS-ES(Q*-65l)xH$WoVF9Z;*I)av50YDuY5t*>b|R9aAF"
    "*iu=xRl7!&V`t4}T|;-*1CBKeQAOPAq;H+}uQ4GNhpiRyHGxoxq*6+(_vsho^A~_pqgd"
    "ZiZfMk?8r;$twlyY`1~PBhZ5zn$2I|-dAR5fA!O;!Uzd?mG8BD{TYKl=!HKuN!X(U>6b"
    "N+Ia-2~RP3bl51Q>%FeY7L;?s5S3sAxLYtZz3@0MZn-bi21a{!7K6zq>i*1T+0$5Pilo"
    "EDAHi(T-(oWjW4!j8(WGEopQ^d(QkpT^#-%fysLwD^{`WiIQ6Jo7x3!Bhq_2mM`Aka#K"
    "1&#TwKqe8HAKx%xp<H{UEO&=M4a8RBRcQ2BXGg1b4O#R-+j<LXOw){<h0)^rG8AzYz-="
    "iKEvfzD?oA3~6K&ulcl5INuht+tP)xUoee}uYoO-!eCLEEb1N0rp;p5vzVM_2(dU&GlE"
    ")Bzc~;xhcR>H#FB_v=-3WJSvcClGnQJ;B68+#-ZCif+*YiB(JD7Wt5!&3vu^HL4Gze>4"
    "?%7ld|-3=A@7kba13EML=ZMI0i}`<LqqI2RLVgDXB7)piMREI-EqwZnD-PGyK>L2w%fr"
    "sb^~HJdG~Cn-4WbFf-rjG2;eXl-HXKG1ZAgbn910=oW01w0&f?~d)<nC&~)624%yBdh0"
    "Uq7BWkA;+;{5TPV=GD=6Av&rwc<++!csAG4c(OaFS_+K6f!WCwGAq3(i{6DOR1`x^o~R"
    "<F*U1?JMlwRi{V2zYlsndY{J>^jJe)_}Jq-^?0KmKj{vic?cRMvu-NuWjHUJ_wXfmt>O"
    "_I`%=@}Z=)m0E8Fua9EYpOf!gB(eLlVa&~$VN9Ut291B5t4;|GD{L6|<k&ky6d1ByGy6"
    "nrdyP^|cb8Y(t@-S%O>;~!o7WsZQt8C1GMYF_|64C+Hc^Kk$=3Br+(D<1MDLxEHX%LIv"
    "Bh|GuR%TT5m<SL<}5Ue!<tyVzl1P8sN@!$wRFohdiMKQG>14CgwhM8~-A}~0HAqfnnvA"
    "}s4%Z73GI9@oWidd$Cu~n?tz=T#<>|jz4>km#w<71iUM1h_v{kZ0c0FO`gIAM;RKqL-R"
    "xQoWU=R_cfW85iGz{xUB3pi6F*alv@A_VDF?43vhqJJA1PYJ*mRrq7dqnP?Q3gS^+G-^"
    "sjAu0;fG2}ds=3)UZf)%28DMku0su5?z7%Rq#ov3gfZT6$mIDT_Sj%IOLfLuCCDv!_9L"
    "=uc8^ogYTEMcXSa3+c5l4w2|;1gJxB!n}vc}9y#rj_J6XT@Gp7$n7UvO7)oAE@zDQWm5"
    "X;k5EJt&XI?IBhsfnNlezorbe1<RXP$ru;=3tI&~pnrx-1c8ZbGTsO@R(zQ`qoTQ}t^k"
    "9BIe$D{ljQp5cC35OG117UNnlWV<E0cxUEON<si`hVx!RibyX30*Ll5&||j=jn8w~R2!"
    "Ht#diW48aC8^6yjoUrm!P8ny_B)dsp=u@mI$67D)@Fj;7IB$jX3v9T_5m#Ki%Tc|2X2`"
    "Nbj-PVEj1}js^u+Z)<VPR!K;%*p<yB|An&LMz1wF%?@&)L!02d3c5|7r4{zf6(z9c#Yv"
    "d`0lB6G{LlOq4XSLX%sxzK&b-+WUVeOm<LB?Vblrb_B`X){+cuqD%F87fxbY8k0kykgn"
    "kDuugcqE{iuWolf_Ov~JTg?}mw&n5AFN&33d|5O=$SCJ)!C90;%)YRD;$O-z(nyDn%ss"
    "daWT#Y)~5du;z+!rFl8hKZvr*-DB#y-~hcQxU?Abu@$Kh*}`*T>)20lJ|`iOO6<ebL-3"
    "Gz`V2snUc55f+<BtBH2S;7ubuY!bI(;$Ea4TA8;Z_bl>XiM4MU;^(IHMI8Lpy8T&{Wv-"
    "T(wkqG&T(-gTmA=w8*RO1iE4bZubvkIj6Bx9yNjoxaCm!1LQ-^uiX5UNvx1HK|?bZ)h-"
    "JhhvZ_@ZTNtW#@F0PfAJx%FaTfNrTuPv=E)Vg*^*REa<9oz(Nd)Tx~JoFN8d#UFh^Hq="
    "ix>x$t6TV!FKX#>Gdi~$~<3IWUJ5*ebl%=7%Isoefy*M;=hLAM0_eRKIh~AF;(?R%QM7"
    "$lv-;JpEBj)3f{W#*k468p5n!gOC-$(sF$D==Qf&4^XxKoxVYGDjECi<&8b9Z9x-NF5d"
    "Yc%mrCc)VRn@{lPDfwYaeRG%jbjN;~7Js-Cex8WGO*((S>;H8>`qvcT?-k{lvNlsU@4>"
    "5?zI$)JzK8k`j`0kcJfO3O;L|MpJR?3lB)*+dpB|XckL(Y#;?Ix5-)7<;_tIap!M`8J|"
    "9x02Jt``5RsBiRnrl0A!}Z*9^Jp8)9k=uS>7(yq9(?<F{O&RG)jaX>DfRh@`SQg5_*D9"
    "JUi*D6{^POx&-vg#Pq+X3KY4apcK"
),
    ),
    dict(
        name='rgb_texture_19x21', w=21, h=19, gray=False, quality=0.5,
        jdk_vs_source_maxdiff=31,
        jpeg_b85=(
    "c-s4a<NpH&0WUXCHwH!~1_nkTWcYuZ!I?pTn}?5wOMs7;Pe@QeSVBWeLQG7;P+3)0!^+"
    "s!#?sir+`%Kp&%q_!)!ZT=H!wUtDLo_I&bP3#Af+NEH9Z+*2&15okc6m&zLb=HvXg~VG"
    "Rffo0R}-124MzKW=16jCP7AKLB{__803NOWMu>c1}I=;VrF4wW9Q)H;sz?%D!{<R$jr>"
    "d!pzFb!UB}71<Et92(k((8alEG2PU#B6^a-&PF%>L?6mQqXwbzED#l4gO`Kd};u4Zls%"
    "q*Qnp!5NX66=_R?aT2ZtfnQUcn)uVc`*xQOPN(Y3Ui6S;Zx#W#tu>Rn0A}ZS5VMU6UqH"
    "nL2IyjG40*Enc#8+42=DS8dw7W$U)>J9h3mboj{8W5-XNJay^vm8;jT-?(|};iJb-o<4"
    "j2;^nK4pFV&2`tAFVpT9u<Vq{=ugaNGn5(N5-iG_ukg&pKCMy7I*0znp5MME|r$3XVPL"
    "SZGNMh+3Di3>L#<Wx2e`XHKAbdgI;#pI#tN08URJ|oU!O=S5D?lFYFZZYsMGXf)zS&+e"
    "=;jz;B;M-ecdiu8d*)8tcDR}4JjRo9YJ7xQ?q;+MSWaz)%rLm#t&Y9+S&G**2*!g_FJ^"
    "xad#tWV;OIGP|N(Q=$gzP<1|NkZc9r6J9"
),
        pixels_b85=(
    "c-lQv*^Z)66nvYcjkbG>IBvANpn{+%h=8(OxIjx!W-|Z(BU5rSRtUj|I<=f*y<YEhI)l"
    "MrI2`^gFdmO*vzb&t6h*vuyPc+K=kxh;F(Mie>Uq)44eZO^Y&M%8A0ORrm*Y6h;d%b^^"
    "K-RYZ8jS=VY}TbigGv{7~Ql^SJwcSq(SnFHvgm1Xy6U{WHJG3Qvh69mQ_{Nb=@!w%Q7w"
    "7ux}>letZwJ;Qjr*TCLV<HPB%L=0RU97K{$t`~4o$r_%{^sQcl~C+?lNx6pC?>)YE~xm"
    ">Q->oAW7#sx;B(JM8hLmlP~<8=2OOdzozWrRNBQmIs_RA3vrNIjiS!R_^WFtA>)VF1C="
    "+wpkR3;3ZIMqZqR*@Hg5(?)?-s|AW62%tk9qws+V@W2dc1yBMZK@^3QMl_A_fQ87Qqju"
    "~L!QlZ0@W%RJfHl7_fDhMo?{}9FlBP7zbCkw*$AAs8AqWmFD580=P#v=4r{{S=5D*fFV"
    "d(oIoVVL;^wuo^Gwf`T8gwYK{#o;AAc|-lCwM|saPygMth-mB-|xdVQo}R2kj4qY2}-+"
    "QZH95Z*f+=b?<DY|zzttl#}`0pC~!WXLlj)R@r?=4y*}aC)(!M0x1hhWcM80+v#p_d1O"
    "XlD_7g6RvNX;g^c$=5uK`Yu#b?#A<9XE%KpjJn-EkbKo9C-zd67qHkWw$fy|MUQ0r<z("
    "*!Ix?beGE|Y#=qXEz90YimsXWs}K4k%G<35*J<~7uGi)9^!r1c9(eee%|I8I>(y4?8JD"
    "N3aWP%oY>;G0{*`{GB<r-Qe5cXxehhp3_~&RM%%zpQSM=#*wO3D*=~9vv`JhOOh<}-OR"
    "(G<Nq<NY>Fy+tR-|bq7Z&!zWN5IVwgt@Q~mx{d8h4J!9pNreQs_5!Qlbq0&by?iWA<aU"
    "XTwE*uBK7hQu2~uNxY=kl7iP=JYQ2ypQ62QBs&<~Qw#wnC8An;)fi9^M%*0tvlGLzG{B"
    "8dMSFYFb"
),
    ),
]


def load():
    import numpy as np
    out = []
    for fx in FIXTURES:
        jpeg = _unpack(fx['jpeg_b85'])
        px = np.frombuffer(_unpack(fx['pixels_b85']),
                           np.uint8)
        out.append((fx, jpeg,
                    px.reshape(fx['h'], fx['w'], 3)))
    return out
